"""Oracle-parity checks for the relational surface at sf0.001 —
the local replica of the driver's gate (every registered query with an
oracle must hash-match)."""

from __future__ import annotations

import pytest

from robin_sparkles_spark.operators import llm_prep, relational, relational2, relational6

from .oracle_utils import assert_query_matches_oracle


def test_rolling_anomaly_flags_planted_spikes(spark):
    """Planted spikes with a full enough window must be flagged
    (known-positive anchors); organic heavy-tail flags may join them
    but no flagged z-score may sit at or below the threshold. Runs at
    sf0.01 (the driver's gate scale): sf0.001's ~7 events per
    type-day never fills the ANOMALY_MIN_N=50 window, so the query is
    legitimately empty there."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators import relational5 as r5
    from robin_sparkles_spark.sources import load_table

    sf_dir = "/root/testdata/sf0.01"
    rows = r5.events_rolling_anomaly(spark, sf_dir).collect()
    assert rows, "anomaly query must be non-vacuous"
    for r in rows:
        assert abs(r.zscore) > r5.ANOMALY_Z
    flagged = {r.event_id for r in rows}
    spiked = {
        r.event_id
        for r in load_table(spark, sf_dir, "events")
        .where(F.col("event_id") % r5.ANOMALY_SPIKE_MOD == 0)
        .collect()
    }
    assert spiked & flagged, "at least some planted spikes must flag"

ALL = {
    **relational.QUERIES,
    **relational2.QUERIES,
    **relational6.QUERIES_TAIL,
    **llm_prep.QUERIES_TAIL,
}


@pytest.mark.parametrize("name", sorted(ALL))
def test_oracle_parity(spark, sf_dir, name):
    fn, oracle = ALL[name]
    assert_query_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)


def test_q1_shape(spark, sf_dir):
    rows = relational.q1_pricing_summary(spark, sf_dir).collect()
    # returnflag × linestatus combos; every aggregate positive
    assert 0 < len(rows) <= 9
    for r in rows:
        assert r.sum_qty > 0 and r.count_order > 0
        assert abs(r.avg_qty - r.sum_qty / r.count_order) < 1e-9


def test_top_customers_is_sorted(spark, sf_dir):
    rows = relational.top_customers_revenue(spark, sf_dir).collect()
    assert len(rows) == 10
    spent = [r.total_spent for r in rows]
    assert spent == sorted(spent, reverse=True)


def test_rollup_grand_total(spark, sf_dir):
    rows = relational.orders_rollup(spark, sf_dir).collect()
    grand = [r for r in rows if r.year == "ALL" and r.priority == "ALL"]
    assert len(grand) == 1
    per_year = sum(r.n_orders for r in rows if r.year != "ALL" and r.priority == "ALL")
    assert grand[0].n_orders == per_year


def test_pack_assign_streams_are_contiguous(spark, sf_dir):
    """Packing invariants the oracle's hash can't articulate: within
    each source the doc_id-ordered offsets tile the token stream with
    no gap or overlap starting at 0, the last doc's end equals the
    source's total token count, and spans are consistent with
    capacity (a doc can straddle at most ceil(n/C)+1 packs)."""
    from robin_sparkles_spark.operators.llm_prep import (
        PACK_CAPACITY,
        docs_pack_assign,
    )

    rows = docs_pack_assign(spark, sf_dir).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert by_source
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in docs:
            assert r.start_tok == expect, (source, r.doc_id)
            expect += r.n_tokens
            assert r.first_pack == r.start_tok // PACK_CAPACITY
            # a doc of n tokens covers at most ceil(n/C) packs plus one
            # extra when its start is unaligned: (n-1)//C + 2
            assert (
                r.n_packs_spanned
                <= (max(r.n_tokens, 1) - 1) // PACK_CAPACITY + 2
            )
        assert expect == sum(r.n_tokens for r in docs)


def test_budget_sample_take_while_semantics(spark, sf_dir):
    """Per source the sample is a hash-ordered take-while: dropping
    its last-drawn doc must land strictly under budget, and a source
    is either budget-filling or fully exhausted (every doc sampled)."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.llm_prep import (
        docs_token_budget_sample,
    )
    from robin_sparkles_spark.sources import load_table

    rows = docs_token_budget_sample(spark, sf_dir).collect()
    totals = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert by_source
    for source, docs in by_source.items():
        budget = docs[0].budget_tokens
        taken = sum(r.n_tokens for r in docs)
        # tie-break on n_tokens: a zero-token doc can share the
        # straddler's cum_before, and the straddler is the one that
        # actually consumed tokens
        last = max(docs, key=lambda r: (r.cum_before, r.n_tokens))
        # every sampled doc started inside the budget
        assert all(r.cum_before < budget for r in docs)
        # take-while: either the source ran out of docs, or removing
        # the straddler drops under budget while the full take covers
        # it (the first unsampled doc's exclusive cum equals `taken`
        # and must sit at or past the budget)
        if len(docs) < totals[source]:
            assert taken - last.n_tokens < budget <= taken
