"""Custom stateful streaming operator via ``applyInPandasWithState``
(EXT — the "custom stateful operators" row of the north star; the
guide's escape hatch when built-in windows can't express the state
machine).

The operator here — a per-user running profile (event count + exact
spend + last-seen timestamp) — is deliberately the kind of thing
``groupBy().agg()`` can't do incrementally across micro-batches
without recomputation: state persists in the state store between
batches, updates are O(batch), and output is one row per touched key
per batch.

Scale notes: state is keyed by user_id and lives in the executor state
store (RocksDB in production via
``spark.sql.streaming.stateStore.providerClass``); a timeout
(ProcessingTime/EventTime) bounds it for unbounded keyspaces — the
fixture run uses NoTimeout because the key space is tiny and finite.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_spend double, last_ts_us long"
STATE_SCHEMA = "n long, spend_cents long, last_ts_us long"


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, spend-in-cents, max ts) per user. Spend is
    kept in integer cents so cross-batch accumulation is exact — the
    streaming twin of the DECIMAL-sum discipline used in batch."""
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(round(float(pdf["value"].sum()) * 100))
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max()) // 1000)
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_spend": [cents / 100.0],
            "last_ts_us": [last_us],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user profile, one updated row per user per
    micro-batch (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
