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
