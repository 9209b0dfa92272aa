"""Vectorized civil-calendar math on epoch days (int32).

Branch-free integer algorithms (Howard Hinnant's civil_from_days /
days_from_civil) so EXTRACT / date_trunc / interval arithmetic run on the VPU
with no host round-trip.  Reference capability: datetime scalar functions
(datafusion/functions/src/datetime/)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def civil_from_days(z):
    """days since 1970-01-01 -> (year, month, day), all int32 arrays."""
    z = z.astype(jnp.int64) + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097  # [0, 146096]
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365  # [0, 399]
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)  # [0, 365]
    mp = (5 * doy + 2) // 153  # [0, 11]
    d = doy - (153 * mp + 2) // 5 + 1  # [1, 31]
    m = jnp.where(mp < 10, mp + 3, mp - 9)  # [1, 12]
    y = jnp.where(m <= 2, y + 1, y)
    return y.astype(jnp.int32), m.astype(jnp.int32), d.astype(jnp.int32)


def days_from_civil(y, m, d):
    y = y.astype(jnp.int64)
    m = m.astype(jnp.int64)
    d = d.astype(jnp.int64)
    y = jnp.where(m <= 2, y - 1, y)
    era = jnp.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return (era * 146097 + doe - 719468).astype(jnp.int32)


def add_months(days, months):
    """Calendar month addition with day clamping (SQL interval semantics)."""
    y, m, d = civil_from_days(days)
    tot = y.astype(jnp.int64) * 12 + (m.astype(jnp.int64) - 1) + months
    ny = (tot // 12).astype(jnp.int32)
    nm = (tot % 12).astype(jnp.int32) + 1
    # clamp day to target month length
    leap = ((ny % 4 == 0) & (ny % 100 != 0)) | (ny % 400 == 0)
    mdays = jnp.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31], dtype=jnp.int32)
    maxd = mdays[nm - 1] + jnp.where(leap & (nm == 2), 1, 0)
    nd = jnp.minimum(d, maxd)
    return days_from_civil(ny, nm, nd)


def dates_from_strings(vals: np.ndarray) -> np.ndarray:
    """Vector of 'y-m-d' strings -> epoch days (int32), tolerating
    non-ISO-padded components ('1999-5-01')."""
    try:
        return vals.astype("datetime64[D]").astype(np.int32)
    except ValueError:
        return np.array([date_str_to_days(str(s)) for s in vals], np.int32)


def date_str_to_days(s: str) -> int:
    try:
        return int(np.datetime64(s, "D").astype(np.int32))
    except ValueError:
        # non-padded components ('1999-5-01') are valid SQL date literals;
        # numpy insists on ISO padding, so normalize y-m-d by hand
        y, m, d = (int(p) for p in s.strip().split("-"))
        return int(np.datetime64(f"{y:04d}-{m:02d}-{d:02d}", "D").astype(np.int32))


def time_str_to_us(s: str) -> int:
    """'HH:MM[:SS[.ffffff]]' -> microseconds since midnight (the TIME
    device representation; reference: Time64Microsecond). Out-of-range
    components are errors, as in the reference's cast."""
    parts = s.strip().split(":")
    h = int(parts[0])
    m = int(parts[1]) if len(parts) > 1 else 0
    sec = float(parts[2]) if len(parts) > 2 else 0.0
    if not (0 <= h <= 23 and 0 <= m <= 59 and 0 <= sec < 60):
        raise ValueError(f"invalid time {s!r}")
    return int(round(((h * 60 + m) * 60 + sec) * 1_000_000))


def times_from_strings(vals: np.ndarray) -> np.ndarray:
    return np.array([time_str_to_us(str(v)) for v in vals], dtype=np.int64)


def us_to_time_str(us: int) -> str:
    us = int(us)
    s, frac = divmod(us, 1_000_000)
    h, rem = divmod(s, 3600)
    m, sec = divmod(rem, 60)
    out = f"{h:02d}:{m:02d}:{sec:02d}"
    if frac:
        out += f".{frac:06d}".rstrip("0")
    return out
