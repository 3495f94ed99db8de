"""Micro-batch-tax gates for BOTH streaming ingest paths (r12 —
VERDICT r11 ask #5): the exact shipped ingest streams drained through
``tools/stream_ingest_probe.py`` at per-file vs single-trigger
``maxFilesPerTrigger``, at the fixture corpus and a 10× corpus — the
same gate pattern as ``test_media_dedup_scale.py``.

What the gates protect (the catastrophic classes, not host noise):

- TAX FLATNESS: the per-trigger fixed cost must not grow with corpus
  size. Measured r12 (min of 2 reps, local[32]): image ~0.94–1.08 s
  per trigger at both 1× and 10×; text ~0.83–0.90 s. A tax that
  scales with the corpus means some per-batch step re-reads or
  rewrites corpus-sized state per micro-batch (the complete-mode
  rewrite growing super-linearly, the index re-staged per trigger).
- AMORTIZATION: one big trigger over the 10× corpus must beat the
  per-file drain by a wide margin (measured 21–22×; gated at 4×).
  If this collapses, per-row work has inflated to where trigger
  sizing no longer matters — the sizing rule recorded in SCALE.md
  ("pick maxFilesPerTrigger so real work ≫ ~1 s/trigger") is dead.
- VERDICT INVARIANCE: the drained verdict row count must not depend
  on trigger slicing (same arrivals → same per-doc verdicts whether
  they arrive in 40 micro-batches or 1).
"""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# per-trigger tax at 10× corpus ≤ ceiling × tax at fixture corpus
# (measured ~0.9× both paths; 3× absorbs host noise on ~1 s deltas)
TAX_FLATNESS_CEILING = 3.0
# 10× per-file wall / 10× single-trigger wall ≥ floor (measured 21–22×)
AMORTIZATION_FLOOR = 4.0

PATHS = ("image", "text")


def _probe_tool():
    spec = importlib.util.spec_from_file_location(
        "stream_ingest_probe",
        os.path.join(REPO, "tools", "stream_ingest_probe.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def probe_results(spark):
    return _probe_tool().run(spark, reps=2, paths=PATHS)


def _single_trigger(case: dict) -> dict:
    """The one-trigger cell, with a diagnosable failure: if staged
    arrival file counts drift from the hardcoded maxFilesPerTrigger
    settings (e.g. a fixture with != expected files makes every mfpt
    produce >1 trigger), say so instead of raising a bare
    StopIteration from an anonymous generator (ADVICE r12)."""
    single = [v for v in case.values() if v["triggers"] == 1]
    assert single, (
        "no single-trigger cell in probe results — staged arrival "
        "file counts drifted from the probe's mfpt settings; observed "
        f"triggers per cell: { {k: v['triggers'] for k, v in case.items()} }"
    )
    return single[0]


def _tax(case: dict) -> float:
    """Per-trigger fixed cost: (per-file wall − single-trigger wall)
    / extra triggers. Both walls are min-of-reps."""
    per_file = min(
        (v for v in case.values() if v["triggers"] > 1),
        key=lambda v: -v["triggers"],
    )
    single = _single_trigger(case)
    return (per_file["wall"] - single["wall"]) / (per_file["triggers"] - 1)


@pytest.mark.parametrize("path", PATHS)
def test_trigger_tax_is_flat_across_corpus_size(path, probe_results):
    fixture_tax = max(_tax(probe_results[path]["fixture"]), 0.05)
    big_tax = _tax(probe_results[path]["10x"])
    assert big_tax <= TAX_FLATNESS_CEILING * fixture_tax, (
        f"{path} ingest per-trigger tax grew with the corpus: "
        f"{big_tax:.2f}s/trigger at 10x vs {fixture_tax:.2f}s at 1x "
        f"(ceiling {TAX_FLATNESS_CEILING}x) — a per-batch step is "
        f"doing corpus-sized work per micro-batch"
    )


@pytest.mark.parametrize("path", PATHS)
def test_single_trigger_amortizes_the_tax(path, probe_results):
    case = probe_results[path]["10x"]
    per_file = case["mfpt_1"]["wall"]
    single = _single_trigger(case)["wall"]
    assert per_file >= AMORTIZATION_FLOOR * single, (
        f"{path} ingest: single-trigger drain ({single:.2f}s) no longer "
        f"amortizes the per-file drain ({per_file:.2f}s) by "
        f"{AMORTIZATION_FLOOR}x — per-row work has inflated; the "
        f"maxFilesPerTrigger sizing rule in SCALE.md is stale"
    )


@pytest.mark.parametrize("path", PATHS)
@pytest.mark.parametrize("label", ("fixture", "10x"))
def test_verdict_rows_invariant_to_trigger_slicing(path, label, probe_results):
    counts = {k: v["rows"] for k, v in probe_results[path][label].items()}
    assert len(set(counts.values())) == 1, (
        f"{path}/{label}: drained verdict count depends on trigger "
        f"slicing: {counts}"
    )


# --- 100× media drain (r13 — VERDICT r12 ask #4) ---------------------------
# The media twin of the r12 text 100× drain: 40k base images (~51k
# rows), arrivals re-sharded to 400 files, drained at mfpt 40 (10
# triggers) and 400 (one trigger) through the REAL readStream path.
# The staged corpus/arrivals/index are cached under spark-warehouse by
# the probe tool, so suite reruns pay only the drains (~30-60 s).


def _sf100_tool():
    spec = importlib.util.spec_from_file_location(
        "sf100_scale_probe",
        os.path.join(REPO, "tools", "sf100_scale_probe.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def media_100x(spark):
    return _sf100_tool().run_stream_media(spark, reps=1)


def test_media_100x_stream_equals_batch(media_100x):
    """The stream==batch contract one decade past the 10× gate: the
    drained verdict rows AND dup counts must equal the batch twin's at
    every trigger slicing (measured r13: 23,715 rows / 10,287 dups,
    identical at mfpt 40 and 400)."""
    for cell in ("mfpt_40", "mfpt_400"):
        assert media_100x[cell]["stream_eq_batch"], (
            f"{cell}: drained verdicts diverged from the batch twin: "
            f"{media_100x[cell]} vs {media_100x['batch_twin']}"
        )


def test_media_100x_single_trigger_amortizes(media_100x):
    """One big trigger must still beat the 10-trigger drain at 100×
    (measured r13: 25.1 s vs 3.35 s = 7.5×; gated at 2× for host
    noise) — if this collapses, per-trigger work has grown
    corpus-sized and the maxFilesPerTrigger sizing rule is dead."""
    many = media_100x["mfpt_40"]["wall"]
    single = media_100x["mfpt_400"]["wall"]
    assert many >= 2.0 * single, (
        f"100× media drain: 10-trigger {many:.2f}s vs single-trigger "
        f"{single:.2f}s — amortization below 2×"
    )


# r14 (VERDICT r13 #5): the AUDIO drain and the VIDEO incremental at
# 100×, mirroring the image/media gates above. Measured r14
# (local[32], min of 2): audio batch twin 6.98 s, mfpt 40 drain
# 19.6 s, mfpt 400 drain 4.98 s (3.9× amortization), 23,715 verdicts /
# 10,373 dups identical at every slicing; video (30k clips, 479k
# frames) batch 21.0 s vs 10-slice foreachBatch-shaped drain 49.9 s
# (17,786 verdicts / 7,714 dups, sliced == batch).


@pytest.fixture(scope="module")
def audio_100x(spark):
    return _sf100_tool().run_stream_audio(spark, reps=1)


def test_audio_100x_stream_equals_batch(audio_100x):
    for cell in ("mfpt_40", "mfpt_400"):
        assert audio_100x[cell]["stream_eq_batch"], (
            f"{cell}: drained audio verdicts diverged from the batch "
            f"twin: {audio_100x[cell]} vs {audio_100x['batch_twin']}"
        )


def test_audio_100x_single_trigger_amortizes(audio_100x):
    many = audio_100x["mfpt_40"]["wall"]
    single = audio_100x["mfpt_400"]["wall"]
    assert many >= 2.0 * single, (
        f"100× audio drain: 10-trigger {many:.2f}s vs single-trigger "
        f"{single:.2f}s — amortization below 2×"
    )


@pytest.fixture(scope="module")
def video_100x(spark):
    return _sf100_tool().run_video_incremental(spark, reps=1)


def test_video_100x_sliced_equals_batch(video_100x):
    """Video's streaming form is the foreachBatch shape (two chained
    aggs — the documented single-agg streaming boundary), so the 100×
    drain is batch-driven: 10 arrival slices against the same
    persisted frame index with index-owned block widths must
    reproduce the one-shot verdicts exactly."""
    assert video_100x["sliced"]["sliced_eq_batch"], (
        f"sliced video verdicts diverged: {video_100x['sliced']} vs "
        f"{video_100x['batch']}"
    )


def test_video_100x_batch_beats_sliced(video_100x):
    """One shot must beat 10 slices (measured 2.4×; gated at 1.3× for
    host noise) — if this collapses, per-slice work has grown
    corpus-sized (e.g. the index side re-derived per slice)."""
    assert video_100x["sliced"]["wall"] >= 1.3 * video_100x["batch"]["wall"]
