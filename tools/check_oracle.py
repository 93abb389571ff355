#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
testdata parquet tables and compare (columns sorted by name, values
hash-compared after row sort). Usage:

    python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def check(out_dir, sf_dir, only=None):
    """Per-query status dict: name -> "ok (N rows)" | "FAIL ..." | "ERR ...".
    Importable (tools/drift_sweep.py merges three scales into DRIFT_r{N}.json);
    main() wraps it for the CLI."""
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            # Read the Spark result via pyarrow WITHOUT pandas type
            # coercion: parquet DECIMAL must stay `Decimal` (the driver's
            # compare renders values, and Decimal('1.60') != float 1.6 as
            # strings — caught r1's q_rename_drop_cast hash mismatch).
            import glob as _glob
            import pyarrow.parquet as _pq
            import pandas as _pd
            _tabs = [_pq.read_table(f) for f in
                     sorted(_glob.glob(f"{out_dir}/{name}/*.parquet"))]
            import pyarrow as _pa
            if _tabs:
                got = _pa.concat_tables(_tabs).to_pandas()
            else:
                # Zero-row result under AQE can leave no part files; compare
                # an empty frame with the oracle's columns instead of ERR.
                got = _pd.DataFrame(columns=exp.columns)
            # pandas object columns of Decimal survive to_pandas(); floats
            # and ints coerce identically to duckdb's .df() path.
            got = _pd.DataFrame(got)
            exp, got = canon(exp), canon(got)
            if list(exp.columns) != list(got.columns):
                results[name] = (f"FAIL columns exp={list(exp.columns)} "
                                 f"got={list(got.columns)}")
                continue
            if len(exp) != len(got):
                results[name] = f"FAIL rows exp={len(exp)} got={len(got)}"
                continue
            mism = None
            for c in exp.columns:
                ev, gv = exp[c].tolist(), got[c].tolist()
                for i, (a, b) in enumerate(zip(ev, gv)):
                    if norm(a) != norm(b):
                        mism = (c, i, a, b)
                        break
                if mism:
                    break
            if mism:
                c, i, a, b = mism
                results[name] = (f"FAIL value col={c} row={i} "
                                 f"exp={a!r} got={b!r}")
            else:
                results[name] = f"ok ({len(exp)} rows)"
        except Exception as e:
            results[name] = f"ERR {str(e)[:300]}"
    return results


def main(out_dir, sf_dir, only=None):
    results = check(out_dir, sf_dir, only)
    ok = sum(1 for v in results.values() if v.startswith("ok"))
    bad = len(results) - ok
    for name, status in sorted(results.items()):
        if status.startswith("ok"):
            print(f"ok   {name} {status[3:]}")
        else:
            print(f"{status.split()[0]:4} {name}: {status.split(' ', 1)[1]}")
    print(f"== {ok} ok / {bad} failing ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
