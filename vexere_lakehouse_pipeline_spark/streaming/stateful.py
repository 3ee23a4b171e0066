"""Custom stateful streaming operators.

The reference has no streaming at all (SURVEY.md §2.9); these are the
engine's scale-path extensions for continuous event pipelines:

- :func:`running_user_totals` — arbitrary per-key state via
  ``applyInPandasWithState`` (Arrow-batched; state is a small tuple per
  key, checkpointed by Spark, so a restart resumes exactly).
- :func:`sessionized_event_counts` — native session windows
  (``F.session_window``) with a watermark bounding state; prefer this
  built-in whenever gap-sessionization is the whole requirement and
  drop to applyInPandasWithState only for logic Spark can't express.

Both run identically over batch DataFrames (session_window) or streams;
tests drive the stream path with ``Trigger.AvailableNow`` and verify
state survives across separate runs through the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = "user_id long, n_events long, total_value double"
RUNNING_TOTALS_STATE = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) maintained as explicit
    group state — the applyInPandasWithState shape for operators the
    built-in aggregations can't express (per-key models, custom decay,
    CEP-ish logic).  Emits one running-snapshot row per key per
    micro-batch (append mode — file sinks can't take updates; readers
    take the per-key max/latest)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionized_event_counts(
    events: DataFrame, gap: str = "30 minutes",
    watermark: str | None = "2 hours"
) -> DataFrame:
    """Gap-based sessions via the native session window: state closes
    ``gap`` after a key's last event, watermark bounds total state.
    Works on batch DataFrames too (no watermark applied there by Spark).
    Pass ``watermark=None`` when the caller already watermarked the
    stream — Spark disallows redefining an event-time watermark.
    """
    src = (
        events.withWatermark("ts", watermark)
        if (events.isStreaming and watermark is not None)
        else events
    )
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas — the successor API to
# applyInPandasWithState: named state variables (ValueState/ListState/
# MapState) on a handle, explicit init/close lifecycle, timers.  Kept
# alongside the legacy operator above so both API generations are
# covered.
# ---------------------------------------------------------------------------
try:  # pragma: no cover - availability gate
    # The TWS protocol speaks protobuf between the JVM and the Python
    # driver worker; a pyspark-4 install without a working protobuf
    # (this container) crashes at query start, so gate on BOTH.
    import google.protobuf.descriptor  # noqa: F401
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotalsProcessor(StatefulProcessor):
        """Per-user running totals as a ValueState named variable."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", RUNNING_TOTALS_STATE
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    HAS_TWS = True
except ImportError:  # pyspark < 4, or protobuf unavailable
    HAS_TWS = False


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """`running_user_totals` on the transformWithStateInPandas API —
    identical semantics, state held in a named ValueState; snapshot row
    per key per micro-batch."""
    if not HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithStateInPandas requires pyspark >= 4.0 and protobuf"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotalsProcessor(),
        outputStructType=RUNNING_TOTALS_OUTPUT,
        outputMode="append",
        timeMode="none",
    )
