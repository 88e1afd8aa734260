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


#: TAI-UTC leap-second steps since 1972 (public IERS Bulletin C table),
#: as (utc unix seconds when the step takes effect, TAI-UTC seconds).
#: The survey's ``midpointmjdtai`` columns are on the TAI scale (reference
#: ``src/webserver/spectrumapp.py:110``, ``src/spectrum.py:127`` convert
#: with astropy ``scale='tai'``); ``scale='tai'`` below reproduces that.
_LEAP_STEPS: list[tuple[int, int]] = [
    (63072000, 10),  # 1972-01-01
    (78796800, 11),  # 1972-07-01
    (94694400, 12),  # 1973-01-01
    (126230400, 13),  # 1974-01-01
    (157766400, 14),  # 1975-01-01
    (189302400, 15),  # 1976-01-01
    (220924800, 16),  # 1977-01-01
    (252460800, 17),  # 1978-01-01
    (283996800, 18),  # 1979-01-01
    (315532800, 19),  # 1980-01-01
    (362793600, 20),  # 1981-07-01
    (394329600, 21),  # 1982-07-01
    (425865600, 22),  # 1983-07-01
    (489024000, 23),  # 1985-07-01
    (567993600, 24),  # 1988-01-01
    (631152000, 25),  # 1990-01-01
    (662688000, 26),  # 1991-01-01
    (709948800, 27),  # 1992-07-01
    (741484800, 28),  # 1993-07-01
    (773020800, 29),  # 1994-07-01
    (820454400, 30),  # 1996-01-01
    (867715200, 31),  # 1997-07-01
    (915148800, 32),  # 1999-01-01
    (1136073600, 33),  # 2006-01-01
    (1230768000, 34),  # 2009-01-01
    (1341100800, 35),  # 2012-07-01
    (1435708800, 36),  # 2015-07-01
    (1483228800, 37),  # 2017-01-01
]


def tai_offset_seconds(unix_utc: Column) -> Column:
    """TAI-UTC in seconds at the given UTC unix-seconds instant — a CASE
    chain over the leap-second table (0 before 1972, where UTC-TAI drift
    was rubber-band rate, out of survey scope)."""
    expr = F.lit(0)
    for threshold, offset in _LEAP_STEPS:
        expr = F.when(unix_utc >= F.lit(threshold), F.lit(offset)).otherwise(expr)
    return expr


def mjd_from_timestamp(ts: Column, scale: str = "utc") -> Column:
    """MJD from a (UTC) timestamp column (reference ``src/util.py:
    303-416``).  ``scale='tai'`` yields the TAI MJD the survey's
    ``midpointmjdtai`` columns carry: UTC MJD + (TAI-UTC)/86400 from the
    leap-second table."""
    u = F.unix_timestamp(ts)
    mjd_utc = u / 86400.0 + F.lit(MJD_UNIX_EPOCH)
    if scale == "utc":
        return mjd_utc
    if scale == "tai":
        return mjd_utc + tai_offset_seconds(u).cast("double") / 86400.0
    raise ValueError(f"unknown scale {scale!r}")


def timestamp_from_mjd(mjd: Column, scale: str = "utc") -> Column:
    """Inverse of mjd_from_timestamp.  For ``scale='tai'`` the offset at
    the target instant is looked up from the UTC-first approximation —
    exact everywhere except within 37 s of a leap step (offsets are
    constant for years at a time)."""
    u_guess = (mjd - F.lit(MJD_UNIX_EPOCH)) * 86400.0
    if scale == "utc":
        return F.timestamp_seconds(u_guess)
    if scale == "tai":
        off = tai_offset_seconds(u_guess.cast("long"))
        return F.timestamp_seconds(u_guess - off.cast("double"))
    raise ValueError(f"unknown scale {scale!r}")


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
