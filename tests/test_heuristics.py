"""Heuristic parity tests — pure Python, no Spark (mirrors the
reference's ComputePartitionsTest plus branch coverage it lacked)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from robin_sparkles_spark.tuner.heuristics import (
    ComputePartitions,
    ConfView,
    ShuffleSize,
    StageInfo,
    parse_size_as_mb,
    stages_with_most_expensive_shuffle,
)


def stage(cpu, stage_time, input_mb, n_exec, n_tasks, task_ms=10, sw=20, sr=30):
    return StageInfo(
        executor_cpu_time_ms=cpu,
        stage_time_ms=stage_time,
        total_input_size_mb=input_mb,
        num_executors=n_exec,
        shuffle=ShuffleSize(sw, sr),
        task_durations_ms=(task_ms,) * n_tasks,
    )


def ref_conf(**extra):
    # ComputePartitionsTest.scala:28-32: the test sets the STANDARD
    # instances key, so possible_concurrent_tasks sees only cores=2.
    base = {
        "spark.executor.instances": "4",
        "spark.executor.cores": "2",
        "spark.executor.memory": f"{round(1024 * 2 / (0.6 * 0.5))}m",
    }
    base.update(extra)
    return ConfView(base, env={})


class TestGoldenFixture:
    # FIXTURES.md A3: the reference test's Int literals overflow to
    # negative sizes before widening; we feed the overflowed values as
    # literal inputs and pin the exact recommendation the reference
    # computes at runtime: max(floor=2, 19, 20) + 3 = 23.
    def test_reference_golden_exact(self):
        first = stage(cpu=105, stage_time=105, input_mb=-2147483648.0, n_exec=3, n_tasks=19, task_ms=11)
        second = stage(cpu=90, stage_time=95, input_mb=-1073741824.0, n_exec=3, n_tasks=20, task_ms=10)
        cp = ComputePartitions(ref_conf())
        got = cp.from_stage_metric_shared_cluster([first, second])
        assert got == 23
        assert got > second.num_partitions_used  # the reference's own assertion

    def test_task_memory_model(self):
        # H2: ceil(6827 * 0.6 * 0.5 / 2) = 1025 (BASELINE.md)
        assert ComputePartitions(ref_conf()).available_task_memory_mb() == 1025.0


class TestH8Branches:
    def test_zero_runs_uses_default_parallelism(self):
        cp = ComputePartitions(ref_conf(**{"spark.default.parallelism": "77"}))
        assert cp.from_stage_metric_shared_cluster([]) == 77

    def test_zero_runs_falls_back_to_concurrent_tasks(self):
        cp = ComputePartitions(ref_conf())
        assert cp.from_stage_metric_shared_cluster([]) == 2  # cores 2 × num.executors default 1

    def test_zero_runs_nonstandard_executors_key(self):
        # H1 quirk: only spark.num.executors is read.
        cp = ComputePartitions(ref_conf(**{"spark.num.executors": "5"}))
        assert cp.from_stage_metric_shared_cluster([]) == 10

    def test_one_run_additive_growth(self):
        cp = ComputePartitions(ref_conf())
        assert cp.from_stage_metric_shared_cluster([stage(100, 100, 10.0, 3, 8)]) == 11

    def test_one_run_input_size_floor_wins(self):
        cp = ComputePartitions(ref_conf())
        # 1025 MB/task; 1025*50 MB input → 50 partitions > 8+3
        assert cp.from_stage_metric_shared_cluster([stage(100, 100, 1025.0 * 50, 3, 8)]) == 50

    def test_uses_last_two_runs(self):
        cp = ComputePartitions(ref_conf())
        runs = [
            stage(500, 500, 10.0, 3, 5),   # ignored by the pairwise step
            stage(105, 105, 10.0, 3, 19, task_ms=11),
            stage(90, 95, 10.0, 3, 20),
        ]
        assert cp.from_stage_metric_shared_cluster(runs) == 23

    def test_equal_partitions_stall(self):
        # Improving CPU but same partition count → "optimal reached"
        cp = ComputePartitions(ref_conf())
        runs = [stage(105, 105, 10.0, 3, 20), stage(90, 95, 10.0, 3, 20)]
        assert cp.from_stage_metric_shared_cluster(runs) == 20

    def test_overshoot_picks_argmin_cpu_over_all_runs(self):
        cp = ComputePartitions(ref_conf())
        runs = [
            stage(80, 100, 10.0, 3, 14),   # best CPU overall
            stage(90, 100, 10.0, 3, 17),
            stage(120, 100, 10.0, 3, 20),  # more partitions, worse CPU
        ]
        assert cp.from_stage_metric_shared_cluster(runs) == 14

    def test_overshoot_tie_keeps_earliest_run(self):
        cp = ComputePartitions(ref_conf())
        runs = [stage(90, 100, 10.0, 3, 14), stage(90, 100, 10.0, 3, 20), stage(95, 100, 10.0, 3, 23)]
        assert cp.from_stage_metric_shared_cluster(runs) == 14


class TestH5:
    def test_more_partitions_better(self):
        a, b = stage(105, 105, 1.0, 3, 19), stage(90, 95, 1.0, 3, 20)
        assert ComputePartitions.more_partitions_is_better(a, b) is True
        assert ComputePartitions.more_partitions_is_better(b, a) is True  # order-insensitive

    def test_more_partitions_worse(self):
        a, b = stage(90, 105, 1.0, 3, 19), stage(105, 95, 1.0, 3, 20)
        assert ComputePartitions.more_partitions_is_better(a, b) is False

    def test_tie_follows_code_not_docstring(self):
        # scala:181-184 stable-sorts, so equal counts compare
        # second.cpu < first.cpu (the docstring's "return false" is
        # not what the code does).
        a, b = stage(105, 105, 1.0, 3, 20), stage(90, 95, 1.0, 3, 20)
        assert ComputePartitions.more_partitions_is_better(a, b) is True
        assert ComputePartitions.more_partitions_is_better(b, a) is False


class TestH7:
    def test_zero_runs(self):
        assert ComputePartitions(ref_conf()).from_stage_metric([]) == 2

    def test_one_run(self):
        assert ComputePartitions(ref_conf()).from_stage_metric([stage(10, 10, 1.0, 3, 8)]) == 11

    def test_uses_first_two_runs(self):
        cp = ComputePartitions(ref_conf())
        runs = [
            stage(105, 105, 10.0, 3, 19, task_ms=1),  # idle: 105*3 - 19 > 0
            stage(90, 95, 10.0, 3, 20, task_ms=1),
            stage(1, 1, 10.0, 3, 50),  # ignored: H7 reads the FIRST two
        ]
        assert cp.from_stage_metric(runs) == 23

    def test_perfect_distribution_branch(self):
        cp = ComputePartitions(ref_conf())
        # idle time = 95*1 - 95 = 0 → max(floor, partitions)
        perfect = stage(90, 95, 10.0, 1, 19, task_ms=5)
        runs = [stage(105, 105, 10.0, 1, 19, task_ms=5), perfect]
        assert cp.from_stage_metric(runs) == 19


class TestConf:
    def test_parse_size_as_mb(self):
        assert parse_size_as_mb("6827m") == 6827
        assert parse_size_as_mb("2g") == 2048
        assert parse_size_as_mb("512") == 512          # bare → MiB
        assert parse_size_as_mb("1048576b") == 1
        assert parse_size_as_mb("2048k") == 2
        assert parse_size_as_mb("1T") == 1024 * 1024

    def test_executor_memory_fallback_chain(self):
        # H3: conf → SPARK_EXECUTOR_MEMORY → SPARK_MEM → 1024
        assert ConfView({"spark.executor.memory": "2g"}, env={}).executor_memory_mb() == 2048
        assert ConfView({}, env={"SPARK_EXECUTOR_MEMORY": "3000"}).executor_memory_mb() == 3000
        assert ConfView({}, env={"SPARK_MEM": "1500"}).executor_memory_mb() == 1500
        assert ConfView({}, env={}).executor_memory_mb() == 1024
        # invalid conf value falls through to env (reference's Try)
        assert ConfView({"spark.executor.memory": "weird"}, env={"SPARK_MEM": "99"}).executor_memory_mb() == 99


class TestJ2Alignment:
    def test_selects_max_shuffle_index_from_run0(self):
        run0 = [stage(1, 1, 1.0, 1, 1, sw=10), stage(2, 2, 1.0, 1, 2, sw=99), stage(3, 3, 1.0, 1, 3, sw=5)]
        run1 = [stage(4, 4, 1.0, 1, 4, sw=0), stage(5, 5, 1.0, 1, 5, sw=0), stage(6, 6, 1.0, 1, 6, sw=0)]
        picked = stages_with_most_expensive_shuffle([run0, run1])
        assert [s.executor_cpu_time_ms for s in picked] == [2, 5]

    def test_ordering_ignores_bytes_read(self):
        # ShuffleSize compares bytesWritten only (scala:32-34)
        run0 = [stage(1, 1, 1.0, 1, 1, sw=10, sr=999), stage(2, 2, 1.0, 1, 2, sw=11, sr=0)]
        assert stages_with_most_expensive_shuffle([run0])[0].executor_cpu_time_ms == 2

    def test_short_runs_skipped(self):
        run0 = [stage(1, 1, 1.0, 1, 1, sw=1), stage(2, 2, 1.0, 1, 2, sw=9)]
        run1 = [stage(3, 3, 1.0, 1, 3, sw=1)]  # missing index 1 → skipped
        picked = stages_with_most_expensive_shuffle([run0, run1])
        assert [s.executor_cpu_time_ms for s in picked] == [2]

    def test_empty_history_returns_empty(self):
        # divergence: reference raises MatchError here
        assert stages_with_most_expensive_shuffle([]) == []


# --- property-based invariants (redeeming the reference's unused
# ScalaCheck dep — SURVEY.md §5.3) -----------------------------------------

stage_strategy = st.builds(
    stage,
    cpu=st.integers(1, 10_000),
    stage_time=st.integers(1, 10_000),
    input_mb=st.floats(0, 1e6, allow_nan=False),
    n_exec=st.integers(1, 16),
    n_tasks=st.integers(1, 500),
    task_ms=st.integers(1, 1000),
)


@given(runs=st.lists(stage_strategy, max_size=6))
@settings(max_examples=200, deadline=None)
def test_recommendation_is_at_least_one(runs):
    cp = ComputePartitions(ref_conf())
    assert cp.from_stage_metric_shared_cluster(runs) >= 1


@given(first=stage_strategy, second=stage_strategy)
@settings(max_examples=200, deadline=None)
def test_growth_while_improving(first, second):
    cp = ComputePartitions(ref_conf())
    rec = cp.from_stage_metric_shared_cluster([first, second])
    if (
        ComputePartitions.more_partitions_is_better(first, second)
        and first.num_partitions_used != second.num_partitions_used
    ):
        # additive growth: strictly above both runs' counts
        assert rec > max(first.num_partitions_used, second.num_partitions_used)
    elif ComputePartitions.more_partitions_is_better(first, second):
        assert rec == second.num_partitions_used
    else:
        # overshoot: the argmin-CPU run's count
        best = min((first, second), key=lambda s: s.executor_cpu_time_ms)
        assert rec == best.num_partitions_used
