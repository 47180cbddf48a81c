"""PostgreSQL-dialect scalar function layer, expressed as Catalyst
expressions (JVM-side, whole-stage-codegen friendly — no Python UDFs).

The reference leans on PG-only functions throughout its SQL:
``TO_CHAR`` (``/root/reference/myapp/views.py:401,413,441,546,599,761,797,834``),
``AT TIME ZONE 'Asia/Kolkata'`` (``views.py:401,413,441,546``),
``pg_size_pretty`` (``views.py:427-428,464``), ``NULLIF``
(``views.py:518,529``), interval arithmetic ``now() - query_start``
(``views.py:402,414,795``). This module supplies Spark-native
equivalents so those queries can be stated 1:1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# PG TO_CHAR pattern atoms -> JVM DateTimeFormatter atoms.
# Sorted longest-first below so e.g. HH24 is rewritten before HH and
# MONTH before MON.
_PG_TO_JAVA = sorted(
    [
        ("HH24", "HH"),
        ("HH12", "hh"),
        ("YYYY", "yyyy"),
        ("YY", "yy"),
        ("MONTH", "MMMM"),
        ("MON", "MMM"),
        ("MI", "mm"),
        ("MM", "MM"),
        ("DDD", "DDD"),
        ("DD", "dd"),
        ("DY", "EEE"),
        ("DAY", "EEEE"),
        ("HH", "hh"),
        ("SS", "ss"),
        ("MS", "SSS"),
        ("US", "SSSSSS"),
        ("AM", "a"),
        ("PM", "a"),
        ("TZ", "zzz"),
        ("OF", "x"),
        ("Q", "Q"),
        # FM ("fill mode") strips the leading-zero padding of the atom
        # it prefixes -> the single-letter JVM field
        ("FMYYYY", "y"),
        ("FMMM", "M"),
        ("FMDDD", "D"),
        ("FMDD", "d"),
        ("FMHH24", "H"),
        ("FMHH12", "h"),
        ("FMHH", "h"),
        ("FMMI", "m"),
        ("FMSS", "s"),
    ],
    key=lambda kv: len(kv[0]),
    reverse=True,
)

# PG atoms with no faithful DateTimeFormatter field: WW/W are PG's
# day-of-year/day-of-month arithmetic weeks ((doy-1)/7+1), IW is the
# ISO week (JVM 'w' is locale-week-fields dependent), TZH/TZM are
# split offset digits. Translating them approximately would silently
# change values, so `to_char` refuses them; WW is provided as the
# expression helper `week_of_year_pg` instead.
_PG_UNSUPPORTED = ["TZH", "TZM", "IW", "WW", "W"]


def pg_to_java_pattern(pg_pattern: str) -> str:
    """Translate a PostgreSQL TO_CHAR pattern to a JVM datetime pattern.

    Handles the atoms the reference actually uses
    (``YYYY-MM-DD HH24:MI:SS``, ``DD/MM/YYYY HH24:MI``,
    ``YYYY:MM:DD HH24:MI`` — views.py:401,599,797) plus the common rest.
    Greedy longest-match scan; punctuation/whitespace pass through.
    """
    # one longest-match scan over supported AND unsupported atoms, so
    # e.g. TZH raises instead of parsing as TZ + literal H
    candidates = sorted(
        [(pg, java) for pg, java in _PG_TO_JAVA]
        + [(bad, None) for bad in _PG_UNSUPPORTED],
        key=lambda kv: len(kv[0]),
        reverse=True,
    )
    out: list[str] = []
    i = 0
    n = len(pg_pattern)
    while i < n:
        for pg, java in candidates:
            if pg_pattern.startswith(pg, i):
                if java is None:
                    raise ValueError(
                        f"TO_CHAR atom {pg!r} has no faithful JVM formatter field "
                        f"(pattern {pg_pattern!r}); for WW use pg_dialect.week_of_year_pg"
                    )
                out.append(java)
                i += len(pg)
                break
        else:
            out.append(pg_pattern[i])
            i += 1
    return "".join(out)


def week_of_year_pg(ts: Column | str) -> Column:
    """PG ``TO_CHAR(ts, 'WW')`` semantics as an expression: week 1
    starts Jan 1, weeks are plain 7-day blocks — ``(doy - 1) / 7 + 1``
    — unlike the JVM's locale-dependent week-of-year field."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return ((F.dayofyear(c.cast("timestamp")) - 1) / 7 + 1).cast("int")


def _ltz(ts: Column | str) -> Column:
    """Normalize a (possibly NTZ) timestamp to LTZ; value-preserving
    under the engine's pinned UTC session timezone."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return c.cast("timestamp")


def to_char(ts: Column | str, pg_pattern: str) -> Column:
    """``TO_CHAR(ts, pattern)`` with a PG-style pattern string."""
    return F.date_format(_ltz(ts), pg_to_java_pattern(pg_pattern))


def at_time_zone(ts: Column | str, tz: str) -> Column:
    """``ts AT TIME ZONE tz`` for a UTC-stored timestamp (views.py:401)."""
    return F.from_utc_timestamp(_ltz(ts), tz)


def age_micros(as_of: Column | str, ts: Column | str) -> Column:
    """``as_of - ts`` as exact integer microseconds.

    The reference uses first-class PG intervals (``now() - query_start``);
    we normalize to epoch-micros BIGINT so comparisons and oracle checks
    are exact across engines (SURVEY §7 "Interval semantics").
    """
    return F.unix_micros(_ltz(as_of)) - F.unix_micros(_ltz(ts))


def nullif_(a: Column, b: Column) -> Column:
    """``NULLIF(a, b)`` — NULL when equal, else ``a`` (views.py:518,529)."""
    return F.when(a == b, F.lit(None)).otherwise(a)


_UNITS = ["B", "KB", "MB", "GB", "TB", "PB"]


def size_pretty_int(nbytes: Column) -> Column:
    """``pg_size_pretty``-style humanization using exact integer division.

    Integer-precision variant (no fractional digits) so the string is
    bit-identical across engines — used in oracle-checked queries.
    Thresholds follow pg_size_pretty: switch unit at 10240 of the
    previous one, i.e. values shown are < 10240 of their unit.
    """
    col = nbytes.cast("bigint")
    expr = F.concat(col.cast("string"), F.lit(" B"))
    scale = 1
    for unit in _UNITS[1:]:
        scale *= 1024
        expr = F.when(
            col >= scale * 10,
            F.concat(F.floor(col / F.lit(scale)).cast("bigint").cast("string"), F.lit(" " + unit)),
        ).otherwise(expr)
    return expr


def size_pretty(nbytes: Column, decimals: int = 1) -> Column:
    """Display variant with fractional digits (not oracle-checked:
    float formatting differs across engines)."""
    col = nbytes.cast("double")
    expr = F.concat(F.round(col, decimals).cast("string"), F.lit(" B"))
    scale = 1.0
    for unit in _UNITS[1:]:
        scale *= 1024.0
        expr = F.when(
            col >= scale * 10,
            F.concat(F.round(col / F.lit(scale), decimals).cast("string"), F.lit(" " + unit)),
        ).otherwise(expr)
    return expr


def interval_pretty(us: Column) -> Column:
    """PG-style rendering of an integer-µs interval for display parity
    with the reference's interval columns (views.py:402,414 show
    ``now() - query_start`` to users as e.g. ``1 day 02:03:04``).

    ``0 days`` is omitted, ``1 day`` is singular, larger counts plural —
    matching PG's interval output; sub-second precision is dropped
    (the reference's panels show whole seconds). Negative intervals
    render as ``-`` plus the absolute value. Display-only by design:
    engine-internal interval math stays integer µs (SURVEY §7), so this
    never appears in oracle-checked outputs.
    """
    v = us.cast("bigint")
    a = F.abs(v)
    days = F.floor(a / F.lit(86_400_000_000)).cast("bigint")
    rem = a % F.lit(86_400_000_000)
    hms = F.format_string(
        "%02d:%02d:%02d",
        F.floor(rem / F.lit(3_600_000_000)).cast("bigint"),
        F.floor(rem % F.lit(3_600_000_000) / F.lit(60_000_000)).cast("bigint"),
        F.floor(rem % F.lit(60_000_000) / F.lit(1_000_000)).cast("bigint"),
    )
    day_part = (
        F.when(days == 0, F.lit(""))
        .when(days == 1, F.lit("1 day "))
        .otherwise(F.concat(days.cast("string"), F.lit(" days ")))
    )
    sign = F.when(v < 0, F.lit("-")).otherwise(F.lit(""))
    return F.concat(sign, day_part, hms)
