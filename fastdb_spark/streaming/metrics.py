"""Event-time windowed stream metrics (watermark + tumbling windows).

The reference has no stream-windowing of its own (SURVEY.md T6) — its
only rate tracking is offline log arithmetic over the stress notes
(reference ``notes/rob_stress_2025apr.txt``).  An operations dashboard
over the alert stream is the natural Spark-first addition: per-band alert
counts and mean flux in tumbling event-time windows, tolerating the
at-least-once transport's late deliveries via a watermark instead of a
batch recount.

Scale shape: windowed aggregation state is keyed by (window, band) — a
handful of live groups per watermark horizon; the watermark bounds state
eviction, so the query runs indefinitely at any input rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_alert_rates(
    stream: DataFrame,
    time_col: str = "savetime",
    band_col: str = "band",
    flux_col: str = "psfflux",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    extra_aggs: list[Column] | None = None,
    quantize_scale: float | None = None,
) -> DataFrame:
    """Tumbling-window per-band alert statistics with late-data tolerance.

    ``time_col`` must be a timestamp column (the ingest path stamps
    ``savetime`` at receive — SURVEY.md T3).  Events later than
    ``watermark`` behind the stream's max event time are dropped from
    these METRICS only; the ingest merge path keeps them (the patch-join
    semantics handle late forced photometry at query time, T5).

    ``quantize_scale`` (e.g. 1e6) makes ``mean_flux`` bit-deterministic
    under ANY accumulation order: each flux is floored to an integral
    double (``floor(x*scale)`` is the same IEEE ops everywhere) and the
    sum of integral doubles below 2^53 is exact integer arithmetic —
    associative, so streaming's arbitrary state-merge order cannot change
    it.  Plain ``avg`` keeps full precision but its last ulp is
    accumulation-order-dependent (only matters for exact-hash gates).
    """
    if quantize_scale:
        # floor twice, round never: round() half-boundaries are where
        # engines disagree, and integer/count quotients land on them often
        q = F.floor(F.col(flux_col) * F.lit(quantize_scale))
        mean = (
            F.floor(F.sum(q) / F.count(F.col(flux_col))).cast("double")
            / F.lit(quantize_scale)
        )
    else:
        mean = F.round(F.avg(flux_col), 6)
    aggs = [
        F.count(F.lit(1)).alias("n_alerts"),
        mean.alias("mean_flux"),
        F.round(F.max(flux_col), 6).alias("max_flux"),
    ]
    if extra_aggs:
        aggs.extend(extra_aggs)
    out = (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("win"), F.col(band_col))
        .agg(*aggs)
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def session_stream_stats(
    stream: DataFrame,
    time_col: str = "savetime",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Streaming sessionization via native session windows — the
    continuous counterpart of the batch lag+cumsum ``sessionize`` query.

    ``F.session_window`` merges events per key whose gaps are below
    ``gap``; a session closes (and, in append mode, emits exactly once)
    when the watermark passes its end.  State per live (key, session) is
    bounded by the watermark horizon, so the query runs indefinitely —
    the scale story tumbling windows have, extended to data-driven
    windows.  No custom state code: Catalyst's session-window operator
    handles merge/expiry (contrast ``streaming.stateful``, which keeps
    the applyInPandasWithState variant for state shapes Spark lacks).
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if extra_aggs:
        aggs.extend(extra_aggs)
    out = (
        stream.withWatermark(time_col, watermark)
        .groupBy(
            F.session_window(F.col(time_col), gap).alias("sess"),
            F.col(key_col),
        )
        .agg(*aggs)
    )
    return out.select(
        F.col(key_col),
        F.col("sess.start").alias("session_start"),
        F.col("sess.end").alias("session_end"),
        *[c for c in out.columns if c not in ("sess", key_col)],
    )
