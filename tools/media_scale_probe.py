"""Scale probe for the decode/archive/container families (VERDICT r9
ask #7): these kernels are map-only mapInPandas parses over staged
media corpora, claimed flat-per-row / embarrassingly parallel — this
tool MEASURES that instead of asserting it.

The declared queries' staged corpora are capped at 500 files per
kind, so a 10× "sf" hop would re-stage the same 500 rows. The honest
scale axis for a map-only kernel is FILE COUNT at fixed per-file
work: this probe synthesizes 1× (500) and 10× (5000) corpora
in-memory (same deterministic synthesizers the staged tables use,
media_id 0..N−1), runs each family's parse kernel through the same
``mapInPandas`` shape, and reports wall ratios. A flat-per-row kernel
on a 32-way session should show ≈10× compute spread over the same
cores — i.e., a ratio near the data ratio once the constant session
overhead is amortized, and NO superlinear term. Rows land in
BASELINE.md's probe table.

Usage: python tools/media_scale_probe.py [--reps 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SMALL, N_BIG = 500, 5000


def families():
    """name → (synth, kind, runner): kind 'blob' runs a bytes→dict
    parser through the generic kernel; kind 'df' times an existing
    DataFrame-level decode (same mapInPandas shape the declared
    queries use)."""
    from robin_sparkles_spark.operators import (
        archive_parse as A,
        container_parse as C,
        media_decode as M,
    )

    return {
        "bmp_pixels": (M.synth_bmp, "df", M.decode_bmp),
        "wav_pcm": (M.synth_wav, "df", M.decode_wav),
        "png_pixels": (M.synth_png, "df", M.decode_png),
        "jpeg_pixels": (C.synth_jpeg_baseline, "blob", C.parse_jpeg_pixels),
        "jpeg_progressive": (
            C.synth_jpeg_progressive_full,
            "blob",
            C.parse_jpeg_progressive_pixels,
        ),
        "mp4_boxes": (C.synth_mp4, "blob", C.parse_mp4),
        "warc_gz_members": (A.synth_warc_gz, "blob", A.parse_warc_gz),
        "warc_zstd_real": (A.synth_warc_zst_real, "blob", A.parse_warc_zst),
        "tfrecord": (A.synth_tfrecord, "blob", A.parse_tfrecord),
    }


def main() -> int:
    reps = (
        int(sys.argv[sys.argv.index("--reps") + 1])
        if "--reps" in sys.argv
        else 2
    )
    import pandas as pd

    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="media_scale_probe")
    out: dict[str, dict] = {}
    for name, (synth, kind, runner) in families().items():
        # synthesize once per size; ids cycle so the per-file work
        # distribution matches at both sizes
        result: dict[str, list[float]] = {}
        for label, n in (("x1", N_SMALL), ("x10", N_BIG)):
            rows = [(i, synth(i % N_SMALL)) for i in range(n)]
            df = spark.createDataFrame(rows, "media_id long, payload binary")
            df = df.repartition(32).localCheckpoint()  # staging outside the timing

            if kind == "df":
                timed = runner(df)
            else:

                def kernel(batches, _parse=runner):
                    for pdf in batches:
                        recs = []
                        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                            d = _parse(bytes(payload))
                            recs.append(
                                (mid, sum(v for v in d.values() if isinstance(v, int)))
                            )
                        yield pd.DataFrame(recs, columns=["media_id", "checksum"])

                timed = df.mapInPandas(
                    kernel, schema="media_id long, checksum long"
                )
            times = []
            for _ in range(reps):
                t0 = time.monotonic()
                cnt = timed.count()
                times.append(round(time.monotonic() - t0, 3))
            assert cnt >= n  # decode_* may emit >=1 row per file
            result[label] = times
        ratio = round(result["x10"][-1] / max(result["x1"][-1], 1e-9), 2)
        out[name] = {
            "x1_last": result["x1"][-1],
            "x10_last": result["x10"][-1],
            "ratio": ratio,
        }
        print(f"{name:22s} x1={result['x1'][-1]:7.3f}s x10={result['x10'][-1]:7.3f}s ratio={ratio}")
    print("RESULT:" + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
