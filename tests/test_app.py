"""End-to-end counting-app lifecycle (the reference's CountingLocalApp
flow): run twice against the same metrics dir and check the sink
overwrite + run recording + reading the tuned output back."""

from __future__ import annotations

from robin_sparkles_spark.app import run_counting_app
from robin_sparkles_spark.metrics.store import MetricsStore


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
