"""Scale-regression gates for the r11 media near-dup dedup family
(image dHash / audio fingerprint / video frame-hash): the exact
shipped decode+hash+blocked-join pipelines at 1× and 10× corpora
through ``tools/media_dedup_scale_probe.py`` — the same gate pattern
as ``test_scale_gates.py``.

These fixtures cap at 400 base items per sf, so the per-round sf
sweeps never exercise the joins past ~550 rows; this is the check
that the blocked-join posture holds when the corpus actually grows.
Measured r11: image 0.87×, audio 1.05×, video 1.66× @ 10× — the
ceilings carry ~2× headroom because the gated failure mode is the
catastrophic class (quadratic band occupancy, corpus broadcast).

The probe also asserts PAIR-COUNT cleanliness: the first image/video
synthesis formulas aliased with period 256 in the id (coefficients
linear mod 256) and inflated 10× outputs ~1.3–3× over planted;
the prime-decoupled formulas hold planted == output at 10×, so a
pair-count blow-up here means fixture correlation regressed."""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# wall-ratio ceilings at 10× corpus (min-of-2-reps both sides)
GATES = {"image": 4.0, "audio": 4.0, "video": 4.0}

# planted pairs at n base items: n/5 perturbed + n/7 copies + n/35
# transitive (ceil for the %-survivors). SLACK absorbs single random
# 63-bit near-collisions (audio shows exactly one at 4000 ids —
# deterministic, engine-agreed); the aliasing regression this catches
# inflated counts by 450–2900.
PAIR_SLACK = 8


def _planted(n: int) -> int:
    return (
        (n + 4) // 5  # base↔perturbed
        + (n + 6) // 7  # base↔copy
        + (n + 34) // 35  # perturbed↔copy
    )


@pytest.fixture(scope="module")
def probe_results(spark):
    spec = importlib.util.spec_from_file_location(
        "media_dedup_scale_probe",
        os.path.join(REPO, "tools", "media_dedup_scale_probe.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.run(spark, reps=2, scale=10), mod.BASE_N


@pytest.mark.parametrize("modality", sorted(GATES))
def test_media_dedup_scales_linearly(modality, probe_results):
    results, _ = probe_results
    row = results[modality]
    ratio = row["big"] / max(row["small"], 1e-9)
    assert ratio <= GATES[modality], (
        f"{modality}: {row['big']:.2f}s @ 10× vs {row['small']:.2f}s "
        f"@ 1× → ratio {ratio:.2f} breaches the {GATES[modality]}× "
        "gate — check the blocked-join widths/pins first"
    )


@pytest.fixture(scope="module")
def groups_results(spark, probe_results):
    # depends on probe_results so the staged corpora + memoized pair
    # parquet are in place before the group stage is timed alone
    spec = importlib.util.spec_from_file_location(
        "media_dedup_scale_probe",
        os.path.join(REPO, "tools", "media_dedup_scale_probe.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.run_groups(spark, reps=2, scale=10), mod.BASE_N


def _planted_groups(n: int) -> int:
    # one group per family that planted ≥1 variant: %5 ∪ %7 survivors
    return (n + 4) // 5 + (n + 6) // 7 - (n + 34) // 35


@pytest.mark.parametrize("modality", sorted(GATES))
def test_media_group_resolution_scales(modality, groups_results):
    """SURVEY r12 candidate #4 (built in r11): the keeper queries'
    GROUP-RESOLUTION stage (label propagation with pointer doubling
    over the pair graph) measured at 10× pairs, decorrelated from the
    hash+join wall via memoized pair parquet. The planted components
    are bounded (≤3 members), so rounds-to-converge is scale-free and
    the per-round joins are linear — the gate catches a superlinear
    regression in the iterative stage."""
    results, _ = groups_results
    row = results[modality]
    ratio = row["big"] / max(row["small"], 1e-9)
    assert ratio <= GATES[modality], (
        f"{modality} groups: {row['big']:.2f}s @ 10× vs "
        f"{row['small']:.2f}s @ 1× → ratio {ratio:.2f} breaches the "
        f"{GATES[modality]}× gate — check the propagation-loop joins"
    )


@pytest.mark.parametrize("modality", sorted(GATES))
def test_media_groups_stay_planted(modality, groups_results):
    """Group counts == planted families at BOTH scales, ± the random-
    collision budget: a random cross-family near-collision can MERGE
    two planted groups (−1) or CREATE a group from two family-less
    base items (+1 — audio's one deterministic 63-bit near-collision
    at 4000 ids does exactly this), so the slack is symmetric."""
    results, base_n = groups_results
    row = results[modality]
    for label, n in (("small_groups", base_n), ("big_groups", base_n * 10)):
        planted = _planted_groups(n)
        assert planted - PAIR_SLACK <= row[label] <= planted + PAIR_SLACK, (
            f"{modality} {label}: {row[label]} groups vs {planted} "
            "planted families — label propagation or fixture "
            "decorrelation regressed"
        )


@pytest.mark.parametrize("modality", sorted(GATES))
def test_media_dedup_pairs_stay_planted(modality, probe_results):
    results, base_n = probe_results
    row = results[modality]
    for label, n in (("small_pairs", base_n), ("big_pairs", base_n * 10)):
        planted = _planted(n)
        assert planted <= row[label] <= planted + PAIR_SLACK, (
            f"{modality} {label}: {row[label]} pairs vs {planted} "
            "planted — fixture decorrelation regressed (see the "
            "prime-moduli notes in the synthesis formulas)"
        )
