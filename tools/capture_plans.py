"""Capture .explain('formatted') output for registry queries.

Usage: python tools/capture_plans.py OUTDIR SUFFIX [--names n1,n2,...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` for each requested query (default:
the bench headline set plus the most expensive extended members). Plans
are captured without executing the query (AQE initial plan), which is
what the optimization-round deliverable asks for: Exchange count, join
strategy, PushedFilters/ReadSchema, codegen spans, Python eval nodes.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Headline set + extended members worth a plan file (>1 s in the r15
# builder's closing bench detail). Kept as an explicit list so before/
# after captures cover the same queries.
DEFAULT_NAMES = [
    # headline
    "wordcount_stopword",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_customers_revenue",
    "order_lineitem_rollup",
    "window_running_user_spend",
    "events_user_stats",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "embedding_similar_pairs_ivf",
    "ann_lsh_topk",
    "events_tumbling_1h",
    "user_sessions",
    "text_top_terms",
    "orders_asof_last_event",
    # expensive extended
    "bpe_merge_training",
    "ann_ivfpq_topk",
    "dedup_simhash_wide",
    "pq_rerank_topk",
    "video_dedup_keepers",
    "column_profile",
    "image_text_pair_curation",
    "crossmodal_paired_recall",
    "crossmodal_text_image_topk",
    "source_overlap_matrix",
    "dedup_containment",
    "audio_dedup_keepers",
    "dedup_video_incremental",
    "semdedup_dropped",
    "ngram_maximal_spans",
    "curation_funnel",
    "dedup_video_phash_strided",
    "dedup_video_phash",
    "referential_integrity_audit",
    "dedup_image_incremental",
    "orders_bloom_prune",
    "ngram_repeated_spans",
    "dedup_audio_incremental",
    "docs_rarity_topk",
    "docs_chunk_dedup",
    "opq_recall_at_k",
    "bpe_fertility_by_lang",
    "ann_ivf_recall_at_k",
    "docs_search_bm25",
    "dedup_image_phash",
    "decontaminate_semantic",
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("outdir")
    ap.add_argument("suffix")
    ap.add_argument("--names", help="comma-separated query names")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ns = ap.parse_args()
    os.makedirs(ns.outdir, exist_ok=True)

    from robin_sparkles_spark import registry
    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    specs = dict(registry.all_queries())
    names = ns.names.split(",") if ns.names else DEFAULT_NAMES
    bad = [n for n in names if n not in specs]
    if bad:
        print(f"unknown query names: {bad}", file=sys.stderr)
        return 2
    for name in names:
        df = specs[name].fn(spark, ns.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(ns.outdir, f"{name}_{ns.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    return 0


if __name__ == "__main__":
    main()
