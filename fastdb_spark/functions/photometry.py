"""Photometry / astronomy column functions (SURVEY.md §2.8 F1-F12).

All pure Column expressions — JVM-side, whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: survey zeropoint: fluxes are nJy, mag = -2.5 log10(flux) + 31.4
#: (reference ``src/ltcv.py:1589-1595``, ``src/spectrum.py:272-276``,
#:  ``tests/conftest.py:331``)
ZEROPOINT = 31.4

#: MJD of the unix epoch (1970-01-01), for timestamp<->MJD conversion.
MJD_UNIX_EPOCH = 40587.0

#: detection-count flux thresholds: flux at mag 24/23/22/21
#: (reference ``src/ltcv.py:1589-1595``; 912/2291/5754/14454 nJy)
MAG_FLUX_THRESHOLDS = {24: 912.011, 23: 2290.87, 22: 5754.40, 21: 14454.4}


def flux2mag(flux: Column, zeropoint: float = ZEROPOINT) -> Column:
    """AB magnitude from nJy flux; non-positive flux -> sentinel 99.0
    (reference ``src/spectrum.py:270-277``)."""
    return F.when(flux > 0.0, -2.5 * F.log10(flux) + zeropoint).otherwise(
        F.lit(99.0)
    )


def mag2flux(mag: Column, zeropoint: float = ZEROPOINT) -> Column:
    """Inverse of flux2mag (reference ``tests/conftest.py:331``)."""
    return F.pow(F.lit(10.0), (mag - zeropoint) / -2.5)


def snr(flux: Column, fluxerr: Column) -> Column:
    """Signal-to-noise ratio (reference ``src/ltcv.py:852-854``)."""
    return flux / fluxerr


def visit_from_mjd(mjd: Column) -> Column:
    """Synthesized visit id ``floor(mjd * 20000)`` (reference
    ``src/admin/load_snana_fits.py:164-209``; SURVEY.md F12)."""
    return F.floor(mjd * 20000).cast("long")


def mjd_from_timestamp(ts: Column) -> Column:
    """UTC MJD from a timestamp column (reference ``src/util.py:303-416``;
    TAI needs a constant leap-second offset applied by the caller)."""
    return F.unix_timestamp(ts) / 86400.0 + F.lit(MJD_UNIX_EPOCH)


def timestamp_from_mjd(mjd: Column) -> Column:
    """Inverse of mjd_from_timestamp."""
    return F.timestamp_seconds((mjd - F.lit(MJD_UNIX_EPOCH)) * 86400.0)


def sexagesimal_to_deg(text: Column, is_ra: bool) -> Column:
    """``HH:MM:SS.s`` / ``+DD:MM:SS.s`` -> degrees (reference
    ``src/util.py:328-378``).  RA hours scale by 15."""
    parts = F.split(text, ":")
    sign = F.when(F.substring(F.trim(text), 1, 1) == "-", -1.0).otherwise(1.0)
    h = F.abs(parts.getItem(0).cast("double"))
    m = parts.getItem(1).cast("double")
    s = parts.getItem(2).cast("double")
    val = sign * (h + m / 60.0 + s / 3600.0)
    return val * 15.0 if is_ra else val


def pack_flags(*mask_conditions: tuple[Column, int]) -> Column:
    """Bitwise-OR a set of (condition, mask) pairs into one packed bigint
    (reference ``src/services/brokerconsumer.py:453-461``; SURVEY.md F7)."""
    out = F.lit(0).cast("long")
    for cond, mask in mask_conditions:
        out = out.bitwiseOR(F.when(cond, F.lit(mask)).otherwise(0).cast("long"))
    return out


def unpack_flag(flags: Column, mask: int) -> Column:
    """Test one bit of a packed bitmask (reference ``src/db.py:1793-1837``)."""
    return flags.bitwiseAND(F.lit(mask)) != 0
