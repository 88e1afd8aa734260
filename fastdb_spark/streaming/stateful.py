"""Cross-micro-batch stateful operators (Structured Streaming state store).

The reference achieves effectively-once ingest by deduplicating its
at-least-once alert deliveries *downstream* — mongo ``$group``/``$first``
per savetime window and ``ON CONFLICT DO NOTHING`` at the catalog
(reference ``src/services/source_importer.py:133-212``,
``src/db.py:1497-1515``; SURVEY.md S4/T4).  The Spark-first streaming
equivalent keeps the seen-set in the state store instead:
``applyInPandasWithState`` emits only the FIRST occurrence of each key
across micro-batches, so every downstream merge becomes a blind append.

Scale shape: state is partitioned by the grouping key (uniform id hash —
no skew); per-key state is a single boolean + timestamp, and the optional
processing-time TTL bounds total state at (arrival rate x TTL), matching
the reference's savetime-window semantics where a duplicate arriving
after the window re-imports harmlessly (idempotent downstream merge).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: per-key state: emitted flag (the timestamp is kept for debuggability)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("emitted", T.BooleanType(), False),
        T.StructField("first_ts", T.DoubleType(), True),
    ]
)


def streaming_first_seen(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """First-seen-wins dedup across micro-batches (A2/S4 as a streaming
    operator).

    Emits each key's earliest row (by ``ts_col``, then remaining columns
    for determinism) exactly once; later deliveries of the same key —
    same batch or any later batch — produce nothing.  With
    ``ttl_minutes`` the per-key state expires after that much processing
    time: a duplicate arriving later than the TTL is re-emitted, which is
    safe by construction because every consumer of this stream merges
    idempotently (DO-NOTHING semantics).
    """
    out_schema = stream.schema
    cols = stream.columns
    order = [ts_col] + [c for c in cols if c != ts_col]
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists and bool(state.get[0]):
            # already emitted; keep the TTL clock running
            if ttl_minutes:
                state.setTimeoutDuration(ttl_minutes * 60_000)
            return
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order, kind="mergesort")
            row = pdf.iloc[0]
            if best is None or row[ts_col] < best[ts_col]:
                best = row
        if best is None:
            return
        state.update((True, float(best[ts_col])))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60_000)
        yield pd.DataFrame([best[cols]])

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, _STATE_SCHEMA, "update", timeout
    )


def tws_available() -> bool:
    """``transformWithStateInPandas`` needs the python ``protobuf`` package
    (its state-server protocol is proto-encoded) and the RocksDB state
    store provider; without protobuf the driver worker crashes at plan
    time.  Feature-gate callers on this."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def streaming_first_seen_tws(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """``streaming_first_seen`` on the Spark-4 ``transformWithStateInPandas``
    operator (successor to ``applyInPandasWithState``): the seen-flag lives
    in a named ``ValueState`` with a NATIVE processing-time TTL, so expiry
    is handled by the state store (RocksDB at scale) instead of per-key
    timeout bookkeeping in Python.  Same contract as the classic variant:
    each key's earliest row is emitted exactly once; post-TTL duplicates
    re-emit harmlessly into idempotent downstream merges.

    Requires ``tws_available()`` (python protobuf) and
    ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider on the session running the stream."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs the python protobuf package; "
            "use streaming_first_seen (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = stream.schema
    cols = stream.columns
    order = [ts_col] + [c for c in cols if c != ts_col]
    ttl_ms = ttl_minutes * 60_000 if ttl_minutes else None

    class _FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", _STATE_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            if self._seen.exists():
                return
            best = None
            for pdf in rows:
                if not len(pdf):
                    continue
                pdf = pdf.sort_values(order, kind="mergesort")
                row = pdf.iloc[0]
                if best is None or row[ts_col] < best[ts_col]:
                    best = row
            if best is None:
                return
            self._seen.update((True, float(best[ts_col])))
            yield pd.DataFrame([best[cols]])

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        _FirstSeen(), out_schema, "Update", "ProcessingTime"
    )
