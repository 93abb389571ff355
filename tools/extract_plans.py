#!/usr/bin/env python3
"""Extract per-query `### q_*` sections from a PLANS.md-format plan
audit into plans/<round>/<query>_<suffix>.txt — used by the
optimization rounds to commit before/after explain("formatted") plans
for the queries they touched (the judge checks plan claims against
these files).

Usage: extract_plans.py <plans_md_path> <out_dir> <suffix> <q1,q2,...>
"""
import sys, os, re

def main():
    src, outdir, suffix, qlist = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
    queries = set(q.strip() for q in qlist.split(",") if q.strip())
    os.makedirs(outdir, exist_ok=True)
    text = open(src).read()
    sections = re.split(r"(?m)^### ", text)
    found = set()
    for sec in sections[1:]:
        name = sec.split("\n", 1)[0].strip()
        if name in queries:
            found.add(name)
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write("### " + sec)
    missing = queries - found
    if missing:
        print(f"WARNING: no section for: {sorted(missing)}", file=sys.stderr)
    print(f"wrote {len(found)} {suffix} plans to {outdir}")

if __name__ == "__main__":
    main()
