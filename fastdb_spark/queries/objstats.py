"""Per-object detection statistics — the reference's materialized views.

The reference builds ``objstats_{pv}`` with a byzantine 12-way self-join of
identical DISTINCT-ON subqueries (first/last/peak detection, ndets, four
flux-threshold counts, three S/N counts — reference ``src/ltcv.py:1600-1757``)
and then a cross-band rollup ``objstatscomb_{pv}`` (``:1781-1815``).

Spark collapses the whole thing into ONE pass (SURVEY.md J8/A4-A6): a single
``groupBy(rootid, band)`` whose aggregate list contains ``min_by`` /
``max_by`` structs and conditional sums.  Semantically identical, one
shuffle, map-side partial aggregation — this is the shape that survives
900M+ forced rows.

The result is a "gold" table refreshed by a job (Q7 — the reference's
REFRESH MATERIALIZED VIEW is manual too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.functions.photometry import MAG_FLUX_THRESHOLDS
from fastdb_spark.versions import ProcverResolver, versioned


def _ostruct(*cols):
    return F.struct(*[c.alias(f"_o{i}") for i, c in enumerate(cols)])


def per_band_stats(
    detections: DataFrame, tiebreak: str | list[str] | None = None
) -> DataFrame:
    """groupBy(rootid, band) one-pass stats over *deduplicated* detections.

    Output mirrors the reference view columns (``src/ltcv.py:1616-1754``):
    first/last/peak (mjd, flux, fluxerr), ndets, ndets24/23/22/21,
    nsn10/7/5.  ``tiebreak`` columns are appended to every argmin/argmax
    ordering for full determinism (Postgres DISTINCT ON has the same tie
    hazard).
    """
    mjd, flux, err = F.col("midpointmjdtai"), F.col("psfflux"), F.col("psffluxerr")
    point = F.struct(mjd.alias("mjd"), flux.alias("flux"), err.alias("fluxerr"))
    t = MAG_FLUX_THRESHOLDS
    if tiebreak is None:
        tb = []
    elif isinstance(tiebreak, str):
        tb = [F.col(tiebreak)]
    else:
        tb = [F.col(c) for c in tiebreak]

    aggs = [
        F.min_by(point, _ostruct(mjd, *tb)).alias("first"),
        F.max_by(point, _ostruct(mjd, *tb)).alias("last"),
        # peak: brightest detection; mjd tiebreak via lexicographic struct
        F.max_by(point, _ostruct(flux, mjd, *tb)).alias("peak"),
        F.count(F.lit(1)).alias("ndets"),
        *[
            F.sum(F.when(flux >= F.lit(t[m]), 1).otherwise(0)).alias(f"ndets{m}")
            for m in (24, 23, 22, 21)
        ],
        *[
            F.sum(F.when(flux / err >= F.lit(s), 1).otherwise(0)).alias(f"nsn{s}")
            for s in (10, 7, 5)
        ],
    ]
    out = detections.groupBy("rootid", "band").agg(*aggs)
    return out.select(
        "rootid",
        "band",
        F.col("first.mjd").alias("firstdetmjd"),
        F.col("first.flux").alias("firstdetflux"),
        F.col("first.fluxerr").alias("firstdetfluxerr"),
        F.col("last.mjd").alias("lastdetmjd"),
        F.col("last.flux").alias("lastdetflux"),
        F.col("last.fluxerr").alias("lastdetfluxerr"),
        F.col("peak.mjd").alias("maxdetmjd"),
        F.col("peak.flux").alias("maxdetflux"),
        F.col("peak.fluxerr").alias("maxdetfluxerr"),
        "ndets",
        "ndets24",
        "ndets23",
        "ndets22",
        "ndets21",
        "nsn10",
        "nsn7",
        "nsn5",
    )


def combined_stats(per_band: DataFrame) -> DataFrame:
    """Cross-band rollup (reference ``src/ltcv.py:1781-1815``): summed
    counts + cross-band argmin/argmax of the per-band firsts/lasts/peaks."""
    first = F.struct(F.col("firstdetmjd"), F.col("firstdetflux"), F.col("firstdetfluxerr"), F.col("band"))
    last = F.struct(F.col("lastdetmjd"), F.col("lastdetflux"), F.col("lastdetfluxerr"), F.col("band"))
    peak = F.struct(F.col("maxdetflux"), F.col("maxdetmjd"), F.col("maxdetfluxerr"), F.col("band"))
    # band appended to every cross-band argmin/argmax ordering: two bands
    # can tie on the mjd/flux keys, and determinism requires a total order
    out = per_band.groupBy("rootid").agg(
        F.min_by(first, _ostruct(F.col("firstdetmjd"), F.col("band"))).alias("first"),
        F.max_by(last, _ostruct(F.col("lastdetmjd"), F.col("band"))).alias("last"),
        F.max_by(
            peak,
            _ostruct(F.col("maxdetflux"), F.col("maxdetmjd"), F.col("band")),
        ).alias("peak"),
        F.sum("ndets").alias("ndets"),
        *[F.sum(f"ndets{m}").alias(f"ndets{m}") for m in (24, 23, 22, 21)],
        *[F.sum(f"nsn{s}").alias(f"nsn{s}") for s in (10, 7, 5)],
    )
    return out.select(
        "rootid",
        F.col("first.firstdetmjd").alias("firstdetmjd"),
        F.col("first.firstdetflux").alias("firstdetflux"),
        F.col("first.band").alias("firstdetband"),
        F.col("last.lastdetmjd").alias("lastdetmjd"),
        F.col("last.lastdetflux").alias("lastdetflux"),
        F.col("last.band").alias("lastdetband"),
        F.col("peak.maxdetmjd").alias("maxdetmjd"),
        F.col("peak.maxdetflux").alias("maxdetflux"),
        F.col("peak.band").alias("maxdetband"),
        "ndets",
        "ndets24",
        "ndets23",
        "ndets22",
        "ndets21",
        "nsn10",
        "nsn7",
        "nsn5",
    )


#: Accumulator type for the weighted-position sums.  Exact decimal addition
#: is associative, so the per-partition summation order Spark happens to use
#: cannot change the result — required for bit-identical parity with any
#: single-threaded oracle (duckdb, or the reference's numpy loop).
_ACC = "decimal(38,12)"


def weighted_positions(detections: DataFrame, min_snr: float = 3.0) -> DataFrame:
    """(S/N)^2-weighted mean/std of detection ra/dec per root (reference
    ``src/ltcv.py:829-877``; SURVEY.md A8).

    The reference loops in numpy; here the two-pass formula is expanded
    algebraically (sum(w x^2)/sum(w) - mu^2) so one aggregation pass
    suffices.  Each double product is rounded once to a fixed 12-decimal
    scale and summed as ``decimal(38,12)`` — order-insensitive, so the
    result is deterministic across partitionings and engines.
    """
    snr = F.col("psfflux") / F.col("psffluxerr")
    w = snr * snr
    det = detections.filter(
        (F.col("psfflux") / F.col("psffluxerr") > F.lit(min_snr))
        & F.col("ra").isNotNull()
        & F.col("dec").isNotNull()
    ).select("rootid", "ra", "dec", w.alias("w"))

    def _acc(expr):
        return F.sum(expr.cast(_ACC))

    agg = det.groupBy("rootid").agg(
        _acc(F.col("w")).alias("sw"),
        _acc(F.col("w") * F.col("ra")).alias("swra"),
        _acc(F.col("w") * F.col("dec")).alias("swdec"),
        _acc(F.col("w") * F.col("ra") * F.col("ra")).alias("swra2"),
        _acc(F.col("w") * F.col("dec") * F.col("dec")).alias("swdec2"),
        _acc(F.col("w") * F.col("ra") * F.col("dec")).alias("swradec"),
        F.count(F.lit(1)).alias("nposdets"),
    )
    # back to doubles for the ratios: numerator and denominator are already
    # deterministic, so plain IEEE division/sqrt is reproducible everywhere
    sw = F.col("sw").cast("double")
    ra_mean = F.col("swra").cast("double") / sw
    dec_mean = F.col("swdec").cast("double") / sw
    return agg.select(
        "rootid",
        ra_mean.alias("ra"),
        dec_mean.alias("dec"),
        F.sqrt(
            F.greatest(F.col("swra2").cast("double") / sw - ra_mean * ra_mean, F.lit(0.0))
        ).alias("raerr"),
        F.sqrt(
            F.greatest(F.col("swdec2").cast("double") / sw - dec_mean * dec_mean, F.lit(0.0))
        ).alias("decerr"),
        (F.col("swradec").cast("double") / sw - ra_mean * dec_mean).alias("ra_dec_cov"),
        "nposdets",
    )


def build_objstats(
    tables: dict[str, DataFrame],
    resolver: ProcverResolver,
    procver: str,
) -> tuple[DataFrame, DataFrame]:
    """Gold-table refresh job: (per-band, combined) stats for one procver
    (replaces reference ``create_objstats_views`` / REFRESH, ``src/ltcv.py:
    1537-1831``)."""
    from fastdb_spark.queries.ltcv import resolve_objects

    objmap = resolve_objects(tables["diaobject"], resolver, procver)
    det = tables["diasource"].join(objmap, on="diaobjectid", how="inner")
    mapping = resolver.bpv_mapping(procver, "diasource")
    det = versioned(det, mapping, keys=("rootid", "visit"), extra_order=("diasourceid",))
    per_band = per_band_stats(det)
    return per_band, combined_stats(per_band)
