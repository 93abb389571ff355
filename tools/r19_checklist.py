#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r19.md per-query checklist from the
committed baseline/closing full bench records (medians + per-pass
mins), with the round's dispositions."""
import json, sys

base = json.load(open('BENCH_FULL_r19_baseline.json'))
clos = json.load(open('BENCH_FULL_r19_closing.json'))

def mins(d):
    return {q: min(p[q] for p in d['per_pass_queries']) for q in d['queries']}

bm, bn = base['queries'], mins(base)
cm, cn = clos['queries'], mins(clos)

direct = {
    'q_mmr_rerank': 'optimized (direct: incremental penalty fold)',
    'q_lang_id_measured': 'optimized (direct: model-grain scoring)',
    'q_quality_classifier': 'optimized (direct: one tokenize pass)',
    'q_ann_ivfpq': 'optimized (direct: r18 persists reverted on measurement)',
    'q_cluster_size_hist': 'optimized (direct: CC counted checkpoint)',
    'q_takedown_audit': 'optimized (direct: clustered bucketed writes + parPhase)',
}
# stored-family first consumers / build billers also touched by the
# bucketed-write clustering
family_firsts = {
    'q_dedup_incremental', 'q_containment_incremental', 'q_bm25',
    'q_hybrid_fusion', 'q_fusion_weight_sweep', 'q_ann_ivf',
    'q_embedding_pq', 'q_pq_rerank', 'q_pq_codebook_sweep',
    'q_chunk_dedup', 'q_dedup_image', 'q_dedup_audio', 'q_dedup_video',
    'q_dedup_spans', 'q_dedup_substrings', 'q_bpe_encode',
    'q_bpe_tokenize', 'q_bpe_fertility', 'q_passage_retrieval',
}

rows = []
for q in sorted(bm):
    d = cn[q] - bn[q]
    if q in direct:
        disp = direct[q]
    elif q in family_firsts:
        disp = 'improved (cross-cutting: table memo + clustered family writes)'
    elif d <= -0.10:
        disp = 'improved (cross-cutting: table memo)'
    elif d >= 0.15:
        disp = 'examined - regression vs baseline, see note'
    else:
        disp = 'measured, within noise (table memo applies)'
    rows.append((q, bm[q], bn[q], cm[q], cn[q], d, disp))

print('| query | base med | base min | close med | close min | dmin | disposition |')
print('|---|---|---|---|---|---|---|')
for q, a, b, c, d2, d, disp in rows:
    print(f'| {q} | {a:.2f} | {b:.2f} | {c:.2f} | {d2:.2f} | {d:+.2f} | {disp} |')
tb, tc = sum(bn.values()), sum(cn.values())
print(f'\ntotals: baseline-min {tb:.1f}s closing-min {tc:.1f}s ({100*(tc-tb)/tb:+.1f}%)')
print(f'medians: baseline {sum(bm.values()):.1f}s closing {sum(cm.values()):.1f}s')
reg = [(q, d) for q, a, b, c, d2, d, _ in rows if d >= 0.15]
print('regressions >=0.15s by min:', reg)
