"""Shared builder for Arrow-batched byte-parse kernels.

Every decode/parse query in ``archive_parse`` / ``container_parse``
runs the same shape: mime-filtered scan → ``mapInPandas`` projection
that applies a pure ``bytes -> dict`` parser per row and emits one
typed stat row per payload (embarrassingly parallel, no shuffle).
This module holds the one kernel builder both share (ADVICE r7:
previously duplicated verbatim in each module).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd


def kernel_over(parse, columns: dict[str, str]):
    """(parser, {stat -> spark type}) -> (mapInPandas kernel, schema).

    The kernel keys each output row by ``media_id`` and evaluates
    ``parse(payload)`` once per input row; ``columns`` names the stats
    pulled from the parser's dict, in schema order.
    """
    schema = "media_id long, " + ", ".join(
        f"{name} {typ}" for name, typ in columns.items()
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": list(pdf["media_id"])}
            parsed = [parse(bytes(p)) for p in pdf["payload"]]
            for name in columns:
                rows[name] = [r[name] for r in parsed]
            yield pd.DataFrame(rows)

    return kernel, schema
