"""Central query registry.

Every implemented operator from SURVEY.md §2 (and the EXT LLM-pipeline
surface) registers here as a named query:

    name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)

The driver's correctness gate runs the Spark side and the DuckDB oracle
side-by-side at sf0.01 and hash-compares (row count + schema +
order-insensitive value hash). Oracle-parity rules used throughout:

- Alias every computed column identically in both dialects.
- No raw timestamps in outputs (mixed ns/ms parquet units + tz rules
  differ) — emit epoch seconds or formatted strings instead.
- No direct double SUMs (accumulation order differs across engines and
  partitions) — sum exact DECIMALs, then cast to double.
- No engine-native hash functions in value-bearing positions — use the
  arithmetic hashes in ``functions.hashing`` (same result both sides).
- Spark ``round`` is HALF_UP, DuckDB HALF_EVEN: only round values that
  cannot land on exact .5 boundaries (doubles effectively never do).

Queries whose semantics SQL can't express (custom streaming state)
register with ``oracle=None`` → the driver records a rows-only check.
Queries whose oracle depends on a fitted model (k-means centroids)
register a CALLABLE ``(sf_dir) -> str`` that runs the fit and returns
literal SQL — resolved lazily via ``resolve_oracle`` so importing the
registry never triggers Spark jobs.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
# oracle entries: static SQL string, lazily generated SQL
# (``(sf_dir) -> str``), or None for rows-only checks

# The driver's documented correctness-gate scale (see __spark_entry__):
# lazy oracles resolve against this when no explicit sf_dir is given.
DRIVER_GATE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01"
)


class QuerySpec(NamedTuple):
    fn: QueryFn
    oracle: "str | Callable[[str], str] | None"


def resolve_oracle(
    oracle: "str | Callable[[str], str] | None", sf_dir: str = DRIVER_GATE_SF_DIR
) -> str | None:
    """Materialize an oracle entry to SQL (or None for rows-only)."""
    return oracle(sf_dir) if callable(oracle) else oracle


def _collect() -> dict[str, QuerySpec]:
    # Imported lazily so a syntax error in one operator module is easy
    # to localize, and so pyspark import cost is paid once.
    from .operators import (
        analytics,
        bpe,
        clustering,
        curation,
        dedup,
        embedding_dedup,
        graph,
        media_decode,
        video_decode,
        quality,
        retrieval,
        scale_ops,
        semdedup,
        sketches,
        multimodal,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        llm_prep,
        pysource,
        similarity,
        skew_queries,
        stats,
        streaming_queries,
        text_analysis,
        timeseries,
        warehouse,
        wordcount_queries,
    )

    registry: dict[str, QuerySpec] = {}
    # Enumeration order is deliberate: the driver gate records rows for
    # exactly the first 50 registry entries and none after (r01 + r02
    # both confirmed the cap), so GATE_FRONT pins this round's
    # must-check queries into the window explicitly. Rotation history:
    # r3 pinned the 22 queries displaced past the r02 cap; r4 pinned
    # its plan/oracle changes (shingle df-cap, kmeans/IVF centroid
    # oracles) + new planted-fixture queries + every events reader
    # (ts layout change) — all green. Round 5 pins the new decode
    # queries, this round's four plan/oracle changes, and rotates in
    # the 16 queries whose last driver row was r02 (two testdata
    # regenerations ago). Everything else follows in module order;
    # displaced previously-green queries keep their hard signal through
    # the parametrized local oracle sweep in tests/ (the pytest replica
    # of this gate).
    modules = (
        wordcount_queries,
        multimodal,
        media_decode,
        streaming_queries,
        clustering,
        dedup,
        embedding_dedup,
        similarity,
        text_analysis,
        relational,
        relational2,
        relational3,
        curation,
        sketches,
        relational4,
        relational5,
        relational6,
        llm_prep,
        skew_queries,
        graph,
        analytics,
        semdedup,
        scale_ops,
        quality,
        retrieval,
        video_decode,
        warehouse,
        timeseries,
        stats,
        bpe,
        pysource,
    )

    def add(name: str, spec: tuple) -> None:
        if name in registry:
            raise ValueError(f"duplicate query name {name!r}")
        registry[name] = QuerySpec(*spec)

    for module in modules:
        for name, spec in module.QUERIES.items():
            add(name, spec)
    for module in modules:
        for name, spec in getattr(module, "QUERIES_TAIL", {}).items():
            add(name, spec)

    if len(GATE_FRONT) > 50:
        raise ValueError(
            f"GATE_FRONT has {len(GATE_FRONT)} entries; the driver gate "
            "records only the first 50 registry entries, so a >50 front "
            "would silently push pinned queries out of the window"
        )
    front = [n for n in GATE_FRONT if n in registry]
    missing = set(GATE_FRONT) - set(front)
    if missing:
        raise ValueError(f"GATE_FRONT names not in registry: {sorted(missing)}")
    ordered = {n: registry[n] for n in front}
    ordered.update((n, s) for n, s in registry.items() if n not in ordered)
    return ordered


# The first 50 registry entries are the driver's correctness window
# (see _collect). Keep this list ≤ 50; names must exist.
#
# ROUND-6 ROTATION PLAN (computed end of r5 from CORRECTNESS_r01–r04 +
# this window): after r5 the stalest driver rows are the 21 queries
# last gated in r03 — bigram_stats, corpus_vocabulary,
# curation_pipeline, dedup_incremental, embedding_array_stats,
# orders_monthly_gapfill, orders_rollup, q10_returned_revenue,
# q12_priority_shipping, q13_order_count_distribution,
# q14_promo_revenue_pct, q17_small_quantity_revenue,
# q18_large_quantity_orders, q19_disjunctive_revenue,
# q22_idle_balance_by_segment, q4_late_shipment_priority,
# q6_forecast_revenue, q7_nation_trade_flows, q8_nation_market_share,
# supplier_revenue_share, window_order_analytics. Pin those first in
# r6 (plus anything whose plan/oracle changes), together with the
# never-driver-gated r5 additions custkey_overlap_kmv,
# docs_token_diversity, events_ewma_value, docs_split_assign,
# orders_price_winsorized, and lineitem_qty_price_ols, plus
# pagerank_trade_graph (its contribution accumulator moved from a
# DECIMAL(38,12) cast to functions.qsum late in r5 — plan+oracle
# changed after its last driver row), then fill with r4-last-green
# names. embedding_array_stats (same qsum change) is already in the
# stale-r03 list above. Also never-driver-gated from late r5:
# docs_pack_assign, orders_snapshot_diff, embedding_gram_matrix,
# docs_token_budget_sample, quality_threshold_sweep,
# table_fingerprints, orders_mv_incremental, bpe_merge_training,
# docs_bpe_tokenize, pysource_events_agg (each builder-verified at
# sf0.01 AND sf0.1 on addition; pysource is scale-independent).
GATE_FRONT: tuple[str, ...] = (
    # r05: new real-decode queries — first driver rows
    "bmp_decode_stats",
    "wav_decode_stats",
    # r05: new TPC-H adaptations + multires rollup — first driver rows
    "q2_min_cost_supplier",
    "q11_part_value_share",
    "q16_supplier_count_by_class",
    "q20_excess_shippers",
    "events_multires_rollup",
    # r05: new training-mix prep queries — first driver rows
    "source_mixture",
    "padding_waste_by_bucket",
    "docs_balanced_sample",
    "events_cohort_enriched",
    # r05: plans/oracles changed this round — need fresh driver rows
    "users_kmv_by_type",  # per-group hash cap before the distinct (plan)
    "orders_quantile_sketch",  # sample via TakeOrderedAndProject (plan)
    "events_rolling_anomaly",  # Σx² accumulator DECIMAL(38,8) → (38,6) (both dialects)
    "dedup_groups",  # pointer-doubling label propagation (plan)
    # r05 second batch: behavioral analytics, context chunking,
    # rarity-topk, SemDeDup — first driver rows
    "events_funnel_conversion",
    "user_retention_cohorts",
    "events_transition_matrix",
    "docs_chunked_context",
    "docs_rarity_topk",
    "semdedup_dropped",
    # r05 second batch: scale-story operators (bloom prune / z-order
    # layout / CDC upsert) — first driver rows
    "orders_bloom_prune",
    "lineitem_zorder_stats",
    "orders_upsert_latest",
    # r05: transformWithState batch twin — first driver row
    "events_spend_alerts",
    # r05 third batch: data-quality audits + retrieval — first driver rows
    "referential_integrity_audit",
    "column_profile",
    "docs_search_and",
    "orders_price_histogram",
    "docs_chunk_dedup",
    "tiff_frame_sample",
    # r05 fourth batch: warehouse/affinity operators — first driver rows
    # (custkey_overlap_kmv and docs_token_diversity didn't fit the 50-cap;
    # they head the r6 rotation list above)
    "orders_scd2_history",
    "copurchase_part_pairs",
    "triangle_count_copurchase",
    # r05 rotation (VERDICT r4 "What's wrong" #2): these last saw a
    # driver row in r02 — two testdata regenerations ago; the builder's
    # local sf0.1 sweeps cover them but the driver gate is the hard
    # signal, so they re-enter the window this round.
    "orders_cube",
    "window_top_order_per_cust",
    "window_order_gap_days",
    "window_running_user_spend",
    "customers_with_big_orders",
    "customers_without_urgent_orders",
    "order_slices_setops",
    "orders_by_month",
    "part_filter_projection",
    "order_lineitem_rollup",
    "nation_region_names",
    "orders_pivot_status",
    "lineitem_unpivot_charges",
    "orders_grouping_sets",
    "orders_price_quantiles",
    "part_string_features",
)


_REGISTRY: dict[str, QuerySpec] | None = None


def all_queries() -> dict[str, QuerySpec]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _collect()
    return _REGISTRY


def spark_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_queries(sf_dir: str = DRIVER_GATE_SF_DIR) -> dict[str, str]:
    """Oracle SQL per query. Lazy (model-dependent) oracles resolve
    against ``sf_dir`` — callers MUST pass the same sf_dir they run the
    Spark queries at (defaults to the driver's documented gate scale;
    override via SPARK_GRAFT_GATE_SF_DIR when gating elsewhere), or the
    centroid-literal oracles describe the wrong corpus and the compare
    fails as a confusing hash mismatch (ADVICE r4). Resolving is
    EAGER for lazy entries: it runs the k-means fit / stages planted
    corpora, possibly creating a local SparkSession as a side effect."""
    return {
        name: resolve_oracle(spec.oracle, sf_dir)
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
