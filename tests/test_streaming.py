"""Structured Streaming tests: batch/stream parity (the streaming
operators must produce exactly the batch twins' results on the finite
fixture), plus oracle parity for the batch twins."""

from __future__ import annotations

import pandas as pd
import pytest

from robin_sparkles_spark.operators import streaming_queries as sq
from robin_sparkles_spark.streaming import events as se

from .oracle_utils import assert_query_matches_oracle


@pytest.mark.parametrize("name", sorted({**sq.QUERIES, **sq.QUERIES_TAIL}))
def test_batch_twin_oracle_parity(spark, sf_dir, name):
    fn, oracle = {**sq.QUERIES, **sq.QUERIES_TAIL}[name]
    assert_query_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def _assert_stream_equals_batch(spark, stream_df, batch_df, name):
    se.run_stream_to_memory(stream_df, name, output_mode="complete")
    got = _sorted_pdf(spark.sql(f"SELECT * FROM {name}"))
    want = _sorted_pdf(batch_df)
    pd.testing.assert_frame_equal(got, want)


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream = se.tumbling_counts_stream(se.events_stream(spark, sf_dir))
    batch = sq.events_tumbling_1h(spark, sf_dir)
    _assert_stream_equals_batch(spark, stream, batch, "t_tumbling")


def test_sliding_stream_equals_batch(spark, sf_dir):
    stream = se.sliding_counts_stream(se.events_stream(spark, sf_dir))
    batch = sq.events_sliding_30_15(spark, sf_dir)
    _assert_stream_equals_batch(spark, stream, batch, "t_sliding")


def test_session_stream_equals_batch(spark, sf_dir):
    stream = se.session_window_stream(se.events_stream(spark, sf_dir))
    batch = sq.user_sessions(spark, sf_dir)
    _assert_stream_equals_batch(spark, stream, batch, "t_sessions")


def test_cohort_enrichment_stream_equals_batch(spark, sf_dir):
    """Stream-STATIC join parity: the static nation dim is joined into
    the event stream per micro-batch; complete-mode output must equal
    the batch twin exactly."""
    from robin_sparkles_spark.sources import load_table

    nations = load_table(spark, sf_dir, "nation")
    stream = se.cohort_enriched_stream(se.events_stream(spark, sf_dir), nations)
    batch = sq.events_cohort_enriched(spark, sf_dir)
    _assert_stream_equals_batch(spark, stream, batch, "t_cohort")


def test_dedup_stream_drops_nothing_on_unique_ids(spark, sf_dir):
    # event_id is unique in the fixture → dedup stream passes all rows
    stream = se.deduped_stream(se.events_stream(spark, sf_dir)).select("event_id")
    se.run_stream_to_memory(stream, "t_dedup", output_mode="append")
    n_stream = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0].n
    from robin_sparkles_spark.sources import load_table

    assert n_stream == load_table(spark, sf_dir, "events").count()


def test_attribution_join_stream_equals_batch(spark, sf_dir):
    """Stream-stream interval join parity: inner-join matches emit
    within the micro-batch that completes them (watermarks bound state,
    not inner-join emission), so the finite fixture yields exactly the
    batch twin's rows in append mode."""
    from pyspark.sql import functions as F

    ev = se.events_stream(spark, sf_dir)
    stream = se.attribution_join_stream(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
    )
    se.run_stream_to_memory(stream, "t_attr", output_mode="append")
    got = _sorted_pdf(spark.sql("SELECT * FROM t_attr"))
    want = _sorted_pdf(sq.view_purchase_attribution(spark, sf_dir))
    assert len(want), "fixture must contain attributable purchases"
    pd.testing.assert_frame_equal(got, want)


def test_attribution_outer_stream_equals_batch_within_horizon(spark, sf_dir):
    """LEFT OUTER stream-stream parity, watermark-aware: a view's
    unmatched (sentinel) row emits only once the purchase watermark
    passes view_ts + 30 min, and the final watermark on a finite
    stream stops 1 h short of max event time — so rows for views
    inside that trailing horizon may legitimately never emit. Assert
    (a) every emitted stream row appears in the batch twin, and
    (b) below the guaranteed horizon the two row sets are EQUAL,
    including sentinel rows (the outer semantics actually streamed)."""
    from pyspark.sql import functions as F

    ev = se.events_stream(spark, sf_dir)
    stream = se.attribution_join_stream_outer(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
    )
    se.run_stream_to_memory(stream, "t_attr_outer", output_mode="append")
    got = spark.sql("SELECT * FROM t_attr_outer")
    want = sq.view_purchase_attribution_outer(spark, sf_dir)

    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows <= want_rows

    max_ts = (
        sq.load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .agg(F.max("ts").alias("m"))
        .collect()[0]
        .m
    )
    horizon = (
        F.to_timestamp(F.col("view_time"))
        + F.expr("INTERVAL 30 MINUTES")
        + F.expr("INTERVAL 1 HOUR")
    ) < F.lit(max_ts)
    got_h = {tuple(r) for r in got.where(horizon).collect()}
    want_h = {tuple(r) for r in want.where(horizon).collect()}
    assert want_h, "horizon slice must be non-empty"
    assert got_h == want_h
    assert any(r[2] == -1 for r in want_h), "sentinel rows must stream too"


def test_media_ingest_stream_equals_batch(spark, sf_dir):
    """Streaming media ingest parity (SURVEY r12 candidate #3): the
    REAL readStream over the multi-file arrivals directory (dHash
    kernel inside the stream, stream-static left join against the
    persisted hash index, grouped argmin aggregation) drained with
    maxFilesPerTrigger=1 must equal the oracle-gated batch twin."""
    import os

    from robin_sparkles_spark.operators.image_dedup import (
        dedup_image_stream_ingest,
    )
    from robin_sparkles_spark.streaming import media_ingest as mi

    stream = mi.media_ingest_stream(spark, sf_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    n_files = len(
        [
            f
            for f in os.listdir(mi.stage_arrivals(spark, sf_dir))
            if f.endswith(".parquet")
        ]
    )
    assert n_files >= 2, "arrivals must land as several micro-batches"
    batch = dedup_image_stream_ingest(spark, sf_dir)
    _assert_stream_equals_batch(spark, stream, batch, "t_media_ingest")


def test_media_ingest_verdicts_cover_split(spark, sf_dir):
    """Every new-batch image gets exactly one verdict; indexed-family
    re-uploads are dups, new families are not."""
    from robin_sparkles_spark.operators.image_dedup import (
        dedup_image_stream_ingest,
    )

    pdf = dedup_image_stream_ingest(spark, sf_dir).toPandas()
    assert pdf.img_id.is_unique
    fam = pdf.img_id // 10
    variant = pdf.img_id % 10
    # variants of indexed families (fam % 4 != 3) re-upload content
    # the index holds → every one must match its base
    reupload = pdf[(fam % 4 != 3) & (variant > 0)]
    assert len(reupload) and reupload.is_dup.all()
    assert (reupload.dup_of == (reupload.img_id // 10) * 10).all()
    # whole new families (fam % 4 == 3): base images are new content
    new_base = pdf[(fam % 4 == 3) & (variant == 0)]
    assert len(new_base) and (~new_base.is_dup).all()
    assert (new_base.dup_of == -1).all() and (new_base.hamming == -1).all()


def test_media_ingest_index_maintenance_end_to_end(spark, sf_dir, tmp_path):
    """The FULL production ingest contract (index maintenance): each
    micro-batch's novel content joins the index, so later batches
    dedup against earlier ones. Invariants asserted are order-free
    (file→batch assignment is Spark's):
    - every arrival gets exactly one verdict across all batches;
    - the final index = initial index + EXACTLY ONE keeper per
      brand-new family (every member of a new family matches its
      base within hamming ≤ 6, so whoever arrives first wins and the
      rest are dups), and zero members of already-indexed families;
    - at least one dup verdict points at a MAINTAINED keeper (an id
      absent from the initial index) — the cross-batch/within-batch
      dedup the read-only form cannot produce."""
    from robin_sparkles_spark.streaming import media_ingest as mi

    state = str(tmp_path / "state")
    results = str(tmp_path / "results")
    q = mi.stream_ingest_with_maintenance(
        spark, sf_dir, state, results, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    verdicts = spark.read.parquet(results).toPandas()
    arrivals = (
        spark.read.parquet(mi.stage_arrivals(spark, sf_dir))
        .select("img_id")
        .toPandas()
    )
    assert sorted(verdicts.img_id) == sorted(arrivals.img_id)
    assert verdicts.img_id.is_unique

    initial = {
        r[0]
        for r in spark.read.parquet(mi.stage_index(spark, sf_dir))
        .select("img_id")
        .collect()
    }
    final = {
        r[0]
        for r in mi.read_index_state(spark, state).select("img_id").collect()
    }
    added = final - initial
    assert initial <= final
    new_families = {i // 10 for i in arrivals.img_id} - {
        i // 10 for i in initial
    }
    # exactly one keeper per new family, none from indexed families
    assert {i // 10 for i in added} == new_families
    assert len(added) == len(new_families)
    # keepers' verdicts say non-dup; everyone else is a dup
    keeper_rows = verdicts[verdicts.img_id.isin(added)]
    assert (~keeper_rows.is_dup).all()
    others = verdicts[~verdicts.img_id.isin(added)]
    assert others.is_dup.all()
    # cross/within-batch dedup against MAINTAINED keepers happened
    assert (others.dup_of.isin(list(added))).any()
    # CHAIN contract (review-hardened): dup_of may name a same-batch
    # dup, but every chain must terminate at an index member or keeper
    chain = dict(zip(others.img_id, others.dup_of))
    terminal = initial | added
    for start in chain:
        cur, hops = start, 0
        while cur in chain:
            cur = chain[cur]
            hops += 1
            assert hops <= len(chain), f"dup_of cycle from {start}"
        assert cur in terminal, f"chain from {start} dangles at {cur}"


def test_media_ingest_maintenance_crash_restart(spark, sf_dir, tmp_path):
    """Kill the maintenance query mid-drain and restart from the same
    checkpoint: the final verdicts and index must satisfy the exact
    invariants of the uninterrupted run — the versioned-snapshot
    commit + replay-stable candidates surviving a REAL interruption,
    not just the unit-level replay."""
    import time as _t

    from robin_sparkles_spark.streaming import media_ingest as mi

    state = str(tmp_path / "state")
    results = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")

    mi.seed_index_state(spark, sf_dir, state)
    n_images = spark.read.parquet(
        mi.stage_image_corpus(spark, sf_dir)
    ).count()
    widths = mi._image_block_widths(n_images)
    stream = mi.arrivals_stream(spark, sf_dir, max_files_per_trigger=1)

    def sink(batch, batch_id):
        mi.apply_ingest_batch(spark, batch, batch_id, state, results, widths)

    def start(**trigger):
        return (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
        )

    # phase 1: stop as soon as ≥1 micro-batch committed, work pending
    q = start(processingTime="0 seconds")
    deadline = _t.time() + 120
    try:
        while _t.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            _t.sleep(0.2)
        else:
            pytest.fail("stream never committed a batch")
    finally:
        q.stop()
    q.awaitTermination(30)

    # phase 2: restart from the same checkpoint, drain the rest
    q2 = start(availableNow=True)
    q2.awaitTermination()

    verdicts = spark.read.parquet(results).toPandas()
    arrivals = (
        spark.read.parquet(mi.stage_arrivals(spark, sf_dir))
        .select("img_id")
        .toPandas()
    )
    assert sorted(verdicts.img_id) == sorted(arrivals.img_id)
    assert verdicts.img_id.is_unique
    initial = {
        r[0]
        for r in spark.read.parquet(mi.stage_index(spark, sf_dir))
        .select("img_id")
        .collect()
    }
    final = {
        r[0]
        for r in mi.read_index_state(spark, state).select("img_id").collect()
    }
    added = final - initial
    new_families = {i // 10 for i in arrivals.img_id} - {
        i // 10 for i in initial
    }
    assert {i // 10 for i in added} == new_families
    assert len(added) == len(new_families)


def test_media_ingest_maintenance_replay_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-applying the same batch id
    immediately (the crash-between-flip-and-checkpoint shape) must
    reach the same verdicts and the same index content — the
    replay-stable candidate-union argument, executed."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.streaming import media_ingest as mi

    state = str(tmp_path / "state")
    results = str(tmp_path / "results")
    mi.seed_index_state(spark, sf_dir, state)
    n_images = spark.read.parquet(
        mi.stage_image_corpus(spark, sf_dir)
    ).count()
    widths = mi._image_block_widths(n_images)
    batch = spark.read.parquet(mi.stage_arrivals(spark, sf_dir)).where(
        F.col("img_id") % 3 == 0
    )

    def snapshot():
        v = sorted(
            map(
                tuple,
                spark.read.parquet(f"{results}/batch_id=7").collect(),
            )
        )
        s = sorted(
            map(tuple, mi.read_index_state(spark, state).collect())
        )
        return v, s

    mi.apply_ingest_batch(spark, batch, 7, state, results, widths)
    first = snapshot()
    mi.apply_ingest_batch(spark, batch, 7, state, results, widths)
    second = snapshot()
    assert first == second
    assert mi._latest_version(state) == 2  # version advanced, content fixed


def test_audio_ingest_stream_equals_batch(spark, sf_dir):
    """Audio streaming ingest parity (the generic hash_ingest_verdicts
    instantiated for acoustic fingerprints): readStream over
    multi-file clip arrivals drained with maxFilesPerTrigger=1 must
    equal the oracle-gated batch twin."""
    from robin_sparkles_spark.operators.audio_dedup import (
        dedup_audio_stream_ingest,
    )
    from robin_sparkles_spark.streaming import media_ingest as mi

    stream = mi.audio_ingest_stream(spark, sf_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    batch = dedup_audio_stream_ingest(spark, sf_dir)
    _assert_stream_equals_batch(spark, stream, batch, "t_audio_ingest")


def test_text_ingest_index_maintenance_end_to_end(spark, sf_dir, tmp_path):
    """Text-ingest maintenance invariants (the fixture's dup structure
    is organic, so the order-free checks are coverage, growth
    accounting, and MONOTONICITY vs the read-only form — the index
    only grows, so anything the static index already catches must
    stay caught)."""
    from robin_sparkles_spark.operators.curation import (
        dedup_text_stream_ingest,
    )
    from robin_sparkles_spark.streaming import text_ingest as ti

    state = str(tmp_path / "state")
    results = str(tmp_path / "results")
    q = ti.stream_text_ingest_with_maintenance(
        spark, sf_dir, state, results, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    verdicts = spark.read.parquet(results).toPandas()
    arrivals = (
        spark.read.parquet(ti.stage_text_arrivals(spark, sf_dir))
        .select("doc_id")
        .toPandas()
    )
    assert sorted(verdicts.doc_id) == sorted(arrivals.doc_id)
    assert verdicts.doc_id.is_unique

    static_dups = {
        r[0]
        for r in dedup_text_stream_ingest(spark, sf_dir)
        .where("is_dup")
        .select("doc_id")
        .collect()
    }
    maintained_dups = set(verdicts[verdicts.is_dup].doc_id)
    assert static_dups <= maintained_dups  # the index only grows

    bands, payload = ti.read_text_index_state(spark, state)
    initial_payload = spark.read.parquet(ti.payload_index_path(sf_dir))
    keepers = set(verdicts[~verdicts.is_dup].doc_id)
    final_ids = {r[0] for r in payload.select("doc_id").collect()}
    initial_ids = {r[0] for r in initial_payload.select("doc_id").collect()}
    assert final_ids == initial_ids | keepers
    # chain contract: every dup_of chain terminates at the index
    dups = verdicts[verdicts.is_dup]
    chain = dict(zip(dups.doc_id, dups.dup_of))
    for start in chain:
        cur, hops = start, 0
        while cur in chain:
            cur = chain[cur]
            hops += 1
            assert hops <= len(chain), f"dup_of cycle from {start}"
        assert cur in final_ids, f"chain from {start} dangles at {cur}"
    # bands stay consistent with payload (keeper band rows landed;
    # no-shingle keepers legitimately have no band rows)
    band_ids = {r[0] for r in bands.select("doc_id").distinct().collect()}
    assert band_ids <= final_ids


def test_text_ingest_maintenance_replay_idempotent(spark, sf_dir, tmp_path):
    """Immediate replay of the same batch id reaches the same
    verdicts and the same (bands, payload) state content."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.streaming import text_ingest as ti

    state = str(tmp_path / "state")
    results = str(tmp_path / "results")
    ti.seed_text_index_state(spark, sf_dir, state)
    batch = spark.read.parquet(ti.stage_text_arrivals(spark, sf_dir)).where(
        F.col("doc_id") % 3 == 0
    )

    def snapshot():
        v = sorted(
            map(
                tuple,
                spark.read.parquet(f"{results}/batch_id=3").collect(),
            )
        )
        bands, payload = ti.read_text_index_state(spark, state)
        return (
            v,
            sorted(map(tuple, bands.collect())),
            sorted(
                (r[0], tuple(r[1])) for r in payload.collect()
            ),
        )

    ti.apply_text_ingest_batch(spark, batch, 3, state, results)
    first = snapshot()
    ti.apply_text_ingest_batch(spark, batch, 3, state, results)
    second = snapshot()
    assert first == second
    assert ti._latest_version(state) == 2


def test_text_ingest_stream_equals_batch(spark, sf_dir):
    """Streaming TEXT dedup ingest parity: readStream over multi-file
    document arrivals (in-stream projection MinHash, stream-static
    band + payload joins against the persisted index, grouped argmax)
    drained with maxFilesPerTrigger=1 must equal the oracle-gated
    batch twin — which itself equals window-ranked dedup_incremental
    (asserted in the smoke run and by the shared oracle)."""
    from robin_sparkles_spark.operators.curation import (
        dedup_text_stream_ingest,
    )
    from robin_sparkles_spark.streaming import text_ingest as ti

    stream = ti.text_ingest_stream(spark, sf_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    batch = dedup_text_stream_ingest(spark, sf_dir)
    _assert_stream_equals_batch(spark, stream, batch, "t_text_ingest")


def test_watermark_is_set(spark, sf_dir):
    stream = se.tumbling_counts_stream(se.events_stream(spark, sf_dir))
    assert stream.isStreaming


def test_checkpoint_crash_recovery_exactly_once(spark, tmp_path):
    """VERDICT r7 ask #4: kill a checkpointed file-source query
    mid-drain, restart it from the same checkpoint (with MORE data
    having landed), and prove exactly-once: the file sink's committed
    output equals the batch read of the full input — no replayed
    duplicates from the interrupted batch, no lost rows. Progress is
    awaited via the commit log (no sleep-and-hope)."""
    import time

    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def land(i):
        (
            spark.range(i * 100, (i + 1) * 100)
            .selectExpr("id", "id * 2 AS v")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(src / f"batch_{i}.parquet"))
        )

    for i in range(4):
        land(i)

    schema = "id long, v long"

    def start(trigger_kwargs):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    # phase 1: continuous trigger, stop as soon as ≥2 micro-batches
    # committed — a mid-drain kill with work still pending
    q = start({"processingTime": "0 seconds"})
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            done = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if len(done) >= 2:
                break
            time.sleep(0.2)
        else:
            pytest.fail("stream never committed 2 batches")
    finally:
        q.stop()
    q.awaitTermination(30)
    committed = spark.read.parquet(sink).count()
    assert committed < 600, "phase 1 already drained everything"

    # more data lands while the query is down
    for i in range(4, 6):
        land(i)

    # phase 2: restart from the SAME checkpoint; availableNow drains
    # the interrupted batch + the remainder + the new files, then stops
    q2 = start({"availableNow": True})
    q2.awaitTermination(120)
    assert not q2.isActive

    got = spark.read.parquet(sink)  # batch read honors _spark_metadata
    want = spark.read.parquet(f"{src}/*")
    assert got.count() == want.count() == 600
    g = got.selectExpr("sum(id) s", "sum(v) sv", "count(distinct id) d").collect()[0]
    w = want.selectExpr("sum(id) s", "sum(v) sv", "count(distinct id) d").collect()[0]
    assert tuple(g) == tuple(w)
    assert g.d == 600  # exactly-once: no duplicated replays

    # idempotent restart: nothing new to do, output unchanged
    q3 = start({"availableNow": True})
    q3.awaitTermination(60)
    assert spark.read.parquet(sink).count() == 600


def test_streaming_cdc_upsert_exactly_once(spark, tmp_path):
    """The changelog SINK side: a checkpointed change stream applied
    via foreachBatch latest-wins merge. Killed mid-drain, restarted
    with more changes landed; the final state equals the batch
    latest-wins over ALL changes (deletes honored), and replaying a
    batch by hand is a no-op — the idempotence that upgrades
    at-least-once foreachBatch delivery to exactly-once state."""
    import time

    from robin_sparkles_spark.streaming import cdc

    src = tmp_path / "changes"
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def land(i):
        # 50 keys, three generations of updates + a rolling delete
        (
            spark.range(50)
            .selectExpr(
                "id AS key",
                f"{i} AS version",
                f"CAST(id * 10 + {i} AS DOUBLE) AS value",
                f"(id % 7 = {i % 7}) AS deleted",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(src / f"gen_{i}.parquet"))
        )

    for i in range(3):
        land(i)

    # phase 1: continuous trigger, stop after ≥1 committed batch
    q = cdc.stream_upsert(spark, str(src), state, ckpt, available_now=False)
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            time.sleep(0.2)
        else:
            pytest.fail("no batch committed")
    finally:
        q.stop()
    q.awaitTermination(30)

    for i in range(3, 5):
        land(i)

    q2 = cdc.stream_upsert(spark, str(src), state, ckpt)
    q2.awaitTermination(120)
    assert not q2.isActive

    got = {
        r.key: (r.version, r.value)
        for r in cdc.read_state(spark, state).collect()
    }
    all_changes = spark.read.parquet(f"{src}/*")
    want_df = cdc.latest_wins(all_changes).where("NOT deleted")
    want = {r.key: (r.version, r.value) for r in want_df.collect()}
    assert got == want
    # the final generation deleted keys ≡ 4 (mod 7); they must be gone
    assert all(k % 7 != 4 for k in got)

    # idempotence: re-applying the last generation changes nothing
    cdc.apply_changes(
        spark, state, spark.read.parquet(str(src / "gen_4.parquet"))
    )
    again = {
        r.key: (r.version, r.value)
        for r in cdc.read_state(spark, state).collect()
    }
    assert again == want


def test_cdc_apply_recovers_from_crashed_attempt(spark, tmp_path):
    """A v(n+1) directory without a marker flip is crash/retry debris
    (the marker IS the commit point); apply_changes must remove it and
    succeed — Structured Streaming re-invokes foreachBatch on retry,
    and the first r11 guard wrongly turned that into a hard failure
    (caught by the full-suite run)."""
    import os

    from robin_sparkles_spark.streaming import cdc

    state = str(tmp_path / "state")
    os.makedirs(state, exist_ok=True)
    b1 = spark.createDataFrame(
        [(1, 1, 1.0, False), (2, 1, 2.0, False)], cdc.CHANGES_SCHEMA
    )
    cdc.apply_changes(spark, state, b1)  # commits v0
    # simulate a crashed second apply: partial v1, marker still at v0
    crashed = os.path.join(state, "v1")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    b2 = spark.createDataFrame(
        [(2, 2, 2.5, False), (3, 1, 3.0, False)], cdc.CHANGES_SCHEMA
    )
    cdc.apply_changes(spark, state, b2)  # the retry must succeed
    got = {
        r.key: r.value for r in cdc.read_state(spark, state).collect()
    }
    assert got == {1: 1.0, 2: 2.5, 3: 3.0}
