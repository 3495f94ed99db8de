"""Oracle parity + semantic invariants for the behavioral-analytics
operators (funnel / retention / transitions) and the scale-story
operators (bloom prune / z-order layout / latest-wins upsert)."""

from __future__ import annotations

import pytest

from robin_sparkles_spark.operators import analytics, scale_ops

from .oracle_utils import assert_query_matches_oracle

ALL = {**analytics.QUERIES_TAIL, **scale_ops.QUERIES_TAIL}


@pytest.mark.parametrize("name", sorted(ALL))
def test_oracle_parity(spark, sf_dir, name):
    fn, oracle = ALL[name]
    assert_query_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)


def test_funnel_is_monotone(spark, sf_dir):
    """Each funnel step can only lose users (the ordered-window
    definition makes step k a strict refinement of step k−1), and
    every count is within [0, 1] of the user base as a fraction."""
    rows = {r.step: r for r in analytics.events_funnel_conversion(spark, sf_dir).collect()}
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    v, c, p = rows["1_view"], rows["2_click"], rows["3_purchase"]
    assert v.reached >= c.reached >= p.reached >= 0
    assert v.reached > 0, "fixture must exercise the funnel"
    for r in rows.values():
        assert 0.0 <= r.pct_of_users <= 1.0


def test_retention_day0_equals_cohort_size(spark, sf_dir):
    """Offset 0 of each cohort counts exactly the users whose first
    event fell on that day — i.e. day-0 retention is 100% by
    construction, and no offset may exceed it."""
    rows = analytics.user_retention_cohorts(spark, sf_dir).collect()
    assert rows
    day0 = {r.cohort_day: r.active_users for r in rows if r.day_offset == 0}
    by_cohort_total = {}
    for r in rows:
        assert r.day_offset >= 0
        day0_n = day0.get(r.cohort_day)
        assert day0_n is not None, "every cohort must have a day-0 row"
        assert r.active_users <= day0_n
    # total day-0 users across cohorts == distinct users in events
    from robin_sparkles_spark.sources import load_table

    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(day0.values()) == n_users


def test_transition_rows_normalize(spark, sf_dir):
    """Within each from_type the probabilities sum to 1 (row-normal
    transition matrix) and every count is positive."""
    rows = analytics.events_transition_matrix(spark, sf_dir).collect()
    assert rows
    sums: dict = {}
    for r in rows:
        assert r.n > 0 and 0.0 < r.p <= 1.0
        sums[r.from_type] = sums.get(r.from_type, 0.0) + r.p
    for src, total in sums.items():
        assert abs(total - 1.0) < 1e-9, (src, total)


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """The bloom pass-set must contain the exact semi-join pass-set
    (bloom filters only ever over-approximate) and the FP rate must
    be sane for m=8192/k=3 at fixture cardinalities (< 50%)."""
    row = scale_ops.orders_bloom_prune(spark, sf_dir).first()
    assert row.bloom_pass >= row.exact_pass
    assert row.false_positives == row.bloom_pass - row.exact_pass
    assert 0.0 <= row.fp_rate < 0.5
    assert row.exact_pass > 0, "segment filter must be non-vacuous"


def test_bloom_broadcasts_the_bit_set(spark, sf_dir):
    """The position set must reach the fact side as a broadcast —
    the entire point of the prune is no fact-side shuffle before the
    filter."""
    from robin_sparkles_spark.plans import audit_plan

    a = audit_plan(scale_ops.orders_bloom_prune(spark, sf_dir))
    assert a.broadcast_joins >= 2, a.formatted  # bit-set + summary joins
    assert not a.has_python_eval


def test_zorder_buckets_bound_both_dims(spark, sf_dir):
    """Every z-bucket's rectangle must be dramatically smaller than
    the full 256×256 key space (the locality the curve exists for):
    with 8-bit interleave, 256 buckets each cover a 16×16 tile, so
    rect_area ≤ 256 exactly — assert the hard geometric bound."""
    rows = scale_ops.lineitem_zorder_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket < scale_ops.Z_BUCKETS
        assert r.rect_area <= 256, (r.bucket, r.rect_area)
        assert r.min_part <= r.max_part and r.min_supp <= r.max_supp


def test_upsert_latest_wins(spark, sf_dir):
    """Changed keys must surface with status 'U' and the merged row
    count must equal the base table's key count (upsert never
    inserts new keys here, only overwrites)."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.sources import load_table

    rows = scale_ops.orders_upsert_latest(spark, sf_dir).collect()
    by_status = {r.o_orderstatus: r for r in rows}
    assert "U" in by_status
    orders = load_table(spark, sf_dir, "orders")
    n_orders = orders.count()
    n_changed = orders.where(
        F.col("o_orderkey") % scale_ops.UPSERT_MOD == 0
    ).count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert by_status["U"].n_orders == n_changed


# --- data-quality + retrieval operators -----------------------------------

def test_quality_and_retrieval_parity(spark, sf_dir):
    from robin_sparkles_spark.operators import quality, retrieval
    from robin_sparkles_spark.registry import resolve_oracle

    for mod in (quality, retrieval):
        for name, (fn, orc) in mod.QUERIES_TAIL.items():
            assert_query_matches_oracle(
                fn(spark, sf_dir), resolve_oracle(orc, sf_dir), sf_dir
            )


def test_referential_integrity_detects_planted_orphans(spark, sf_dir):
    """The fixture is expected clean (all rates 0) — so prove the
    detector by planting: run the same anti-join shape against a
    parent table with rows removed and require the orphans to
    surface."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators import quality
    from robin_sparkles_spark.sources import load_table

    rows = quality.referential_integrity_audit(spark, sf_dir).collect()
    assert len(rows) == len(quality.FK_PAIRS)
    assert all(r.orphans == 0 and r.orphan_rate == 0.0 for r in rows), (
        "fixture schema unexpectedly has orphans — audit caught a real one"
    )
    # plant: drop half the nation parents and run THE AUDIT's own pair
    # detector against the broken set (r5 review: a hand-rolled join
    # here would let a constant-zero counting bug in the audit pass) —
    # orphans must surface in the audit row itself, and exactly match
    # the customers of the removed nations
    cust = load_table(spark, sf_dir, "customer")
    broken_parent = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_nationkey") % 2 == 0)
        .select("n_nationkey")
    )
    row = quality.audit_fk_pair(
        cust.select("c_nationkey"),
        broken_parent,
        fk_label="customer.c_nationkey",
        ref_label="broken_nation.n_nationkey",
    ).first()
    expect = cust.where(F.col("c_nationkey") % 2 == 1).count()
    assert row.orphans == expect > 0
    assert row.child_rows == cust.count()
    assert row.orphan_rate == expect / cust.count()


def test_column_profile_shape_and_sanity(spark, sf_dir):
    """Profiler bounds must be NUMERICALLY correct for numeric
    columns (the r5 review found MIN over the rendered string —
    lexicographic garbage the mirrored oracle passed); pin one
    column's bounds against an independent aggregation."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators import quality
    from robin_sparkles_spark.sources import load_table

    rows = {r.col_name: r for r in quality.column_profile(spark, sf_dir).collect()}
    assert set(rows) == {f"{t}.{c}" for t, c in quality.PROFILE_COLUMNS}
    numeric = {
        f"{t}.{c}"
        for t, c in quality.PROFILE_COLUMNS
        if c not in ("o_orderstatus", "event_type")
    }
    for name, r in rows.items():
        assert r.n_nulls == 0  # fixture has no nulls in profiled cols
        assert 0 < r.n_distinct <= r.n_rows
        if name in numeric:
            assert float(r.min_str) <= float(r.max_str), name
        else:
            assert r.min_str <= r.max_str, name
    true_bounds = (
        load_table(spark, sf_dir, "orders")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .first()
    )
    got = rows["orders.o_totalprice"]
    assert float(got.min_str) == round(true_bounds.lo, 2)
    assert float(got.max_str) == round(true_bounds.hi, 2)


def test_search_and_requires_both_terms(spark, sf_dir):
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators import retrieval
    from robin_sparkles_spark.sources import load_table

    rows = retrieval.docs_search_and(spark, sf_dir).collect()
    assert rows, "conjunctive query must be non-vacuous on the fixture"
    t1, t2 = retrieval.SEARCH_TERMS
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id").isin([r.doc_id for r in rows[:20]]))
        .collect()
    }
    for r in rows[:20]:
        toks = docs[r.doc_id].split(" ")
        assert r.n_t1 == sum(1 for w in toks if w == t1)
        assert r.n_t2 == sum(1 for w in toks if w == t2)
        assert r.n_t1 > 0 and r.n_t2 > 0


def test_histogram_masses_sum_to_one(spark, sf_dir):
    from robin_sparkles_spark.operators import quality
    from robin_sparkles_spark.sources import load_table

    rows = quality.orders_price_histogram(spark, sf_dir).collect()
    assert rows
    n_total = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_total
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0 <= r.bucket < quality.HIST_BUCKETS
        assert r.hi - r.lo == quality.HIST_WIDTH


def test_table_fingerprint_order_insensitive_and_sensitive(spark, sf_dir):
    """The content fingerprint must ignore row order/partitioning and
    notice a single-row change: repartitioned input yields the same
    fp; perturbing one order's price by one cent moves it."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.quality import (
        _FP_MOD,
        _FP_SPECS,
        _fp_rowh_spark,
    )
    from robin_sparkles_spark.sources import load_table

    rowh = _fp_rowh_spark(_FP_SPECS["orders"])
    base = load_table(spark, sf_dir, "orders")

    def fp(df):
        return (
            df.select(rowh.alias("rowh"))
            .agg((F.sum("rowh") % _FP_MOD).cast("long").alias("fp"))
            .collect()[0]
            .fp
        )

    assert fp(base) == fp(base.repartition(13))
    bumped = base.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") == base.select(F.min("o_orderkey")).first()[0],
            F.col("o_totalprice") + 0.01,
        ).otherwise(F.col("o_totalprice")),
    )
    assert fp(bumped) != fp(base)
