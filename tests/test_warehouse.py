"""Warehouse/affinity operator invariants beyond the oracle sweep:
triangle counting on planted graphs of known answer, SCD2 interval
algebra, and the KMV overlap estimator's degenerate (sets smaller
than K) regime where the sketch must go exact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from robin_sparkles_spark.operators import warehouse

SF_SMALL = "/root/testdata/sf0.001"


def _edges_df(spark, pairs):
    return spark.createDataFrame([Row(pa=a, pb=b) for a, b in pairs])


def test_triangle_summary_on_k4_clique(spark):
    """K4: 4 nodes, 6 edges, C(4,3)=4 triangles, Σ C(3,2)·4 = 12
    wedges, clustering exactly 1.0 (every wedge closes)."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    row = warehouse.triangle_summary(_edges_df(spark, k4)).collect()[0]
    assert row.n_nodes == 4
    assert row.n_edges == 6
    assert row.n_triangles == 4
    assert row.n_wedges == 12
    assert row.clustering_coeff == 1.0
    # orientation bound: every wedge candidate is an oriented 2-path;
    # K4 oriented by (deg, id) is a total order → C(4,3) per apex sums
    # to 4 candidates... (computed, not assumed: candidates ≥ triangles)
    assert row.n_candidates >= row.n_triangles


def test_triangle_summary_on_square_is_zero(spark):
    """C4 (4-cycle): wedges exist (4 of them) but none closes."""
    square = [(1, 2), (2, 3), (3, 4), (1, 4)]
    row = warehouse.triangle_summary(_edges_df(spark, square)).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 4
    assert row.clustering_coeff == 0.0


def test_triangle_summary_hub_plus_one_edge(spark):
    """Star + one rim edge: exactly the one triangle through the rim
    edge, regardless of hub degree — the shape the degree orientation
    exists for (the hub must end up as every oriented edge's DST, so
    the hub's degree never enters the wedge fan-out)."""
    hub = [(1, k) for k in range(2, 12)] + [(2, 3)]
    row = warehouse.triangle_summary(_edges_df(spark, hub)).collect()[0]
    assert row.n_triangles == 1
    # out-degree bound under orientation: rim nodes have deg ≤ 2, hub
    # deg 10 → oriented out-degree of every node ≤ 2 (never 10)
    assert row.n_candidates <= 2 * row.n_edges


def test_scd2_interval_algebra(spark):
    """Per key: contiguous versions (valid_to of v_i == valid_from of
    v_{i+1}), exactly one open (is_current) row closed with the
    sentinel, version count 2 or 3 by the changelog's sampling rule."""
    out = warehouse.orders_scd2_history(spark, SF_SMALL).collect()
    assert out, "empty SCD2 output"
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.o_orderkey, []).append(r)
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r.version)
        assert len(rows) in (2, 3)
        expected = 3 if key % (3 * warehouse.SCD_MOD) == 0 else 2
        assert len(rows) == expected, key
        for cur, nxt in zip(rows, rows[1:]):
            assert cur.valid_to_day == nxt.valid_from_day, key
            assert cur.is_current == 0
            assert cur.valid_from_day < cur.valid_to_day
        last = rows[-1]
        assert last.is_current == 1
        assert last.valid_to_day == warehouse.SCD_OPEN_DAY


def test_scd2_price_chain(spark):
    """The price ladder follows the changelog deltas exactly (doubles:
    +10.0 and +20.0 are exact in binary)."""
    out = warehouse.orders_scd2_history(spark, SF_SMALL).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.o_orderkey, []).append(r)
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r.version)
        base = rows[0].price
        assert rows[1].price == base + warehouse.SCD_DELTA
        if len(rows) == 3:
            assert rows[2].price == base + 2 * warehouse.SCD_DELTA


def test_kmv_overlap_degenerate_small_sets_exact(spark):
    """At sf0.001 both custkey sets are far below K=256, so the
    sketches ARE the sets and the estimator must short-circuit to the
    exact intersection (the degenerate-regime guard)."""
    row = warehouse.custkey_overlap_kmv(spark, SF_SMALL).collect()[0]
    assert row.exact_a < warehouse.OVERLAP_K
    assert row.exact_b < warehouse.OVERLAP_K
    assert row.est_inter == float(row.exact_inter)
    assert row.rel_error == 0.0


def test_kmv_overlap_estimator_accuracy(spark):
    """In the live regime (sf0.01: sets ≈ 1.3–1.4k > K) the KMV
    Jaccard estimator should land within ~3/√K of truth — loose 25%
    bound so the test pins the algebra, not the luck of one hash.
    sf0.01 explicitly: the smoke SF sits below K and would exercise
    only the degenerate branch the previous test already covers."""
    row = warehouse.custkey_overlap_kmv(spark, "/root/testdata/sf0.01").collect()[0]
    assert row.exact_a > warehouse.OVERLAP_K
    assert row.rel_error < 0.25, row


def test_copurchase_cap_bounds_fanout(spark, sf_dir):
    """No order contributes more than C(cap,2) pairs: plant a
    mega-basket via the capped-items helper directly."""
    capped = warehouse._capped_items(spark, sf_dir)
    per_order = (
        capped.groupBy("l_orderkey").agg(F.count("*").alias("n")).agg(F.max("n"))
    ).collect()[0][0]
    assert per_order <= warehouse.BASKET_CAP


def test_warehouse_tail_oracle_parity(spark, sf_dir):
    """Pytest replica of the driver gate for every declared warehouse
    query (the 50-slot driver window can't hold them all)."""
    from .oracle_utils import assert_query_matches_oracle

    for name, (fn, orc) in warehouse.QUERIES_TAIL.items():
        assert_query_matches_oracle(fn(spark, sf_dir), orc, sf_dir)


def test_snapshot_diff_counts_match_construction(spark):
    """The diff must recover EXACTLY the synthesized changes: one
    'removed' per key ending in 3, one 'changed' per key ending in 6
    (the +750-cent/status mutation always moves the affine
    fingerprint), one 'added' per key ending in 0 — and nothing
    else."""
    from robin_sparkles_spark.sources import load_table

    by_type = {
        r.change_type: r.n
        for r in warehouse.orders_snapshot_diff(spark, SF_SMALL)
        .groupBy("change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    keys = [
        r.o_orderkey
        for r in load_table(spark, SF_SMALL, "orders")
        .select("o_orderkey")
        .collect()
    ]
    assert by_type.get("removed", 0) == sum(1 for k in keys if k % 10 == 3)
    assert by_type.get("changed", 0) == sum(1 for k in keys if k % 10 == 6)
    assert by_type.get("added", 0) == sum(1 for k in keys if k % 10 == 0)
    assert set(by_type) <= {"added", "removed", "changed"}
