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

Queries whose semantics SQL can't express (streaming state, iterative
algorithms) register with ``oracle=None`` → the driver records a
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class QuerySpec(NamedTuple):
    fn: QueryFn
    oracle: str | None


def _collect() -> dict[str, QuerySpec]:
    # Imported lazily so a syntax error in one operator module is easy
    # to localize, and so pyspark import cost is paid once.
    from .operators import (
        clustering,
        curation,
        dedup,
        sketches,
        multimodal,
        relational,
        relational2,
        relational3,
        relational4,
        similarity,
        streaming_queries,
        text_analysis,
        wordcount_queries,
    )

    registry: dict[str, QuerySpec] = {}
    # Enumeration order is deliberate: the driver gate records rows for
    # exactly the first 50 registry entries and none after (r01 + r02
    # both confirmed the cap), so GATE_FRONT pins this round's
    # must-check queries into the window explicitly: the 22 declared
    # queries that sat past the r02 cap and have never had a driver
    # CORRECTNESS row, followed by queries whose plan or oracle changed
    # this round (kmeans/IVF oracle flip, shingle df-cap, banded-LSH
    # rework, new planted-fixture queries). Everything else follows in
    # module order; the displaced previously-green queries keep their
    # hard signal through the parametrized local oracle sweep in
    # tests/ (the pytest replica of this gate).
    modules = (
        wordcount_queries,
        multimodal,
        streaming_queries,
        clustering,
        dedup,
        similarity,
        text_analysis,
        relational,
        relational2,
        relational3,
        curation,
        sketches,
        relational4,
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

    front = [n for n in GATE_FRONT if n in registry]
    missing = set(GATE_FRONT) - set(front)
    if missing:
        raise ValueError(f"GATE_FRONT names not in registry: {sorted(missing)}")
    ordered = {n: registry[n] for n in front}
    ordered.update((n, s) for n, s in registry.items() if n not in ordered)
    return ordered


# The first 50 registry entries are the driver's correctness window
# (see _collect). Keep this list ≤ 50; names must exist.
GATE_FRONT: tuple[str, ...] = (
    # r02 post-cap queries — first-ever driver rows this round
    "q10_returned_revenue",
    "supplier_revenue_share",
    "q17_small_quantity_revenue",
    "embedding_array_stats",
    "window_order_analytics",
    "q6_forecast_revenue",
    "q12_priority_shipping",
    "q14_promo_revenue_pct",
    "dedup_incremental",
    "curation_pipeline",
    "view_purchase_attribution",
    "corpus_vocabulary",
    "bigram_stats",
    "users_kmv_by_type",
    "q7_nation_trade_flows",
    "q8_nation_market_share",
    "q13_order_count_distribution",
    "q18_large_quantity_orders",
    "q19_disjunctive_revenue",
    "q22_idle_balance_by_segment",
    "q4_late_shipment_priority",
    "orders_monthly_gapfill",
    # plans/oracles changed in r03 — need fresh rows
    "kmeans_assign",
    "ann_ivf_topk",
    "dedup_ngram_jaccard",
    "ann_lsh_topk",
    "dedup_groups",
    "dedup_minhash_lsh",
)


_REGISTRY: dict[str, QuerySpec] | None = None


def all_queries() -> dict[str, QuerySpec]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _collect()
    return _REGISTRY


def spark_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_queries() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
