"""Date/time function library.

Reference: presto-main/.../operator/scalar/DateTimeFunctions.java (1361 LoC).
The reference's unit-string signatures (date_add('day', 3, ts)) differ from
Spark's per-unit functions — this module is the thin shim layer SURVEY §2.2
calls for, plus the MySQL-format translator for date_format/date_parse.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


register("current_date")(lambda: F.current_date())
register("current_timestamp")(lambda: F.current_timestamp())
register("now")(lambda: F.current_timestamp())
register("localtimestamp")(lambda: F.localtimestamp())
register("from_unixtime")(lambda x: F.timestamp_seconds(_c(x)))
register("to_unixtime")(lambda ts: F.unix_timestamp(_c(ts)).cast("double"))
register("to_iso8601")(lambda ts: F.date_format(_c(ts), "yyyy-MM-dd'T'HH:mm:ss.SSS"))
register("from_iso8601_timestamp")(lambda s: F.to_timestamp(_c(s)))
register("from_iso8601_date")(lambda s: F.to_date(_c(s)))
register("last_day_of_month")(lambda ts: F.last_day(_c(ts)))

register("year")(lambda ts: F.year(_c(ts)).cast("bigint"))
register("quarter")(lambda ts: F.quarter(_c(ts)).cast("bigint"))
register("month")(lambda ts: F.month(_c(ts)).cast("bigint"))
register("week")(lambda ts: F.weekofyear(_c(ts)).cast("bigint"))
register("week_of_year")(lambda ts: F.weekofyear(_c(ts)).cast("bigint"))
register("day")(lambda ts: F.dayofmonth(_c(ts)).cast("bigint"))
register("day_of_month")(lambda ts: F.dayofmonth(_c(ts)).cast("bigint"))
register("hour")(lambda ts: F.hour(_c(ts)).cast("bigint"))
register("minute")(lambda ts: F.minute(_c(ts)).cast("bigint"))
register("second")(lambda ts: F.second(_c(ts)).cast("bigint"))
register("millisecond")(
    lambda ts: (F.date_part(F.lit("microsecond"), _c(ts)) / 1000).cast("bigint") % 1000
)
# reference day_of_week: ISO, Monday=1..Sunday=7 (DateTimeFunctions.java);
# Spark dayofweek is Sunday=1 → shift.
register("day_of_week")(lambda ts: ((F.dayofweek(_c(ts)) + 5) % 7 + 1).cast("bigint"))
register("dow")(lambda ts: ((F.dayofweek(_c(ts)) + 5) % 7 + 1).cast("bigint"))
register("day_of_year")(lambda ts: F.dayofyear(_c(ts)).cast("bigint"))
register("doy")(lambda ts: F.dayofyear(_c(ts)).cast("bigint"))
# ISO week-year.
register("year_of_week")(lambda ts: F.date_format(_c(ts), "YYYY").cast("bigint"))
register("yow")(lambda ts: F.date_format(_c(ts), "YYYY").cast("bigint"))

_TRUNC_UNITS = {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}


@register("date_trunc")
def date_trunc(unit: str, ts) -> Column:
    unit = unit.lower()
    if unit not in _TRUNC_UNITS:
        raise ValueError(f"date_trunc: unsupported unit {unit!r}")
    return F.date_trunc(unit, _c(ts))


_ADD_UNITS = {
    "millisecond": "INTERVAL '0.001' SECOND",
    "second": "INTERVAL 1 SECOND",
    "minute": "INTERVAL 1 MINUTE",
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
    "week": "INTERVAL 7 DAY",
    "month": "INTERVAL 1 MONTH",
    "quarter": "INTERVAL 3 MONTH",
    "year": "INTERVAL 1 YEAR",
}


@register("date_add")
def date_add(unit: str, n, ts) -> Column:
    """date_add('unit', n, ts) — the reference's unit-string signature."""
    unit = unit.lower()
    if unit not in _ADD_UNITS:
        raise ValueError(f"date_add: unsupported unit {unit!r}")
    n = F.lit(n) if isinstance(n, int) else _c(n)
    return _c(ts) + n * F.expr(_ADD_UNITS[unit])


@register("date_diff")
def date_diff(unit: str, a, b) -> Column:
    """date_diff('unit', start, end) — whole units from start to end
    (truncating, like the reference's DateTimeFunctions.diffTimestamp)."""
    unit = unit.lower()
    a, b = _c(a), _c(b)
    us = F.unix_micros(b.cast("timestamp")) - F.unix_micros(a.cast("timestamp"))
    per = {
        "millisecond": 1000,
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
        "week": 7 * 86_400_000_000,
    }
    if unit in per:
        return (us / per[unit]).cast("bigint")
    if unit == "month":
        return F.floor(F.months_between(b, a)).cast("bigint")
    if unit == "quarter":
        return F.floor(F.months_between(b, a) / 3).cast("bigint")
    if unit == "year":
        return F.floor(F.months_between(b, a) / 12).cast("bigint")
    raise ValueError(f"date_diff: unsupported unit {unit!r}")


# --- MySQL-format translation (date_format / date_parse) -------------------
# The reference uses MySQL %-codes (DateTimeFunctions.java DateFormat);
# Spark uses java.time patterns.  Translation table for the documented
# subset; unknown codes raise (loud, like the reference's
# IllegalArgumentException for unsupported specifiers).
_MYSQL_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%M": "MMMM", "%b": "MMM", "%m": "MM", "%c": "M",
    "%d": "dd", "%e": "d", "%j": "DDD",
    "%H": "HH", "%k": "H", "%h": "hh", "%l": "h", "%i": "mm",
    "%S": "ss", "%s": "ss", "%f": "SSSSSS",
    "%p": "a", "%r": "hh:mm:ss a", "%T": "HH:mm:ss",
    "%W": "EEEE", "%a": "EEE", "%v": "ww",
    "%%": "%",
}


def mysql_format_to_java(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            code = fmt[i : i + 2]
            if code not in _MYSQL_TO_JAVA:
                raise ValueError(f"unsupported MySQL format specifier {code!r}")
            out.append(_MYSQL_TO_JAVA[code])
            i += 2
        elif ch.isalpha():
            # literal letters must be quoted in java.time patterns
            out.append(f"'{ch}'")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


@register("date_format")
def date_format(ts, fmt: str) -> Column:
    return F.date_format(_c(ts), mysql_format_to_java(fmt))


@register("date_parse")
def date_parse(s, fmt: str) -> Column:
    return F.to_timestamp(_c(s), mysql_format_to_java(fmt))


# format_datetime / parse_datetime use Joda patterns ≈ java.time for the
# common subset; passed through.
register("format_datetime")(lambda ts, fmt: F.date_format(_c(ts), fmt))
register("parse_datetime")(lambda s, fmt: F.to_timestamp(_c(s), fmt))


# --------------------------------------------------------------------------
# Time-zone surface (DateTimeFunctions.java:269-296, 1157-1172).  Our model
# (SURVEY §1.2): timestamps are zone-less; the instant is interpreted in the
# engine session zone (UTC).  at_timezone re-renders the instant in another
# zone — same translation the sqlfront emits for AT TIME ZONE.
@register("at_timezone")
def at_timezone(ts, zone) -> Column:
    """at_timezone(timestamp, zone) — DateTimeFunctions.java:269."""
    return F.from_utc_timestamp(_c(ts), zone if isinstance(zone, str) else _c(zone))


def _zone_offset_seconds(ts, zone) -> Column:
    # to_utc_timestamp(ts, zone) = ts - offset(zone @ ts)  ⇒
    # offset = ts - to_utc_timestamp(ts, zone), in seconds.
    z = zone if isinstance(zone, str) else _c(zone)
    return F.unix_timestamp(_c(ts)) - F.unix_timestamp(F.to_utc_timestamp(_c(ts), z))


@register("timezone_hour")
def timezone_hour(ts, zone: str = "UTC") -> Column:
    """timezone_hour(ts[, zone]) — DateTimeFunctions.java:1165; the reference
    reads the offset packed into timestamp-with-tz (DateTimeEncoding.java),
    ours derives it from the rendering zone (session UTC default → 0)."""
    off = _zone_offset_seconds(ts, zone)
    return (off / 3600).cast("bigint")


@register("timezone_minute")
def timezone_minute(ts, zone: str = "UTC") -> Column:
    """timezone_minute(ts[, zone]) — DateTimeFunctions.java:1157."""
    off = _zone_offset_seconds(ts, zone)
    return ((off % 3600) / 60).cast("bigint")


# --------------------------------------------------------------------------
# Remaining DateTimeFunctions.java surface: current_time/localtime (reference
# TIME type — modeled as HH:mm:ss.SSS strings per SURVEY §1.2 low-priority
# TIME mapping), current_timezone, date(), to_milliseconds, parse_duration.
register("current_time")(lambda: F.date_format(F.now(), "HH:mm:ss.SSS"))
register("localtime")(lambda: F.date_format(F.localtimestamp(), "HH:mm:ss.SSS"))
register("current_timezone")(lambda: F.current_timezone())
register("date")(lambda x: _c(x).cast("date"))

_EPOCH = "CAST('1970-01-01 00:00:00' AS TIMESTAMP)"


@register("to_milliseconds")
def to_milliseconds(i) -> Column:
    """to_milliseconds(interval day to second) — DateTimeFunctions.java.

    Micros-exact via epoch shift (CAST(interval AS BIGINT) truncates to
    whole seconds, so it is not used)."""
    return (F.unix_micros(F.expr(_EPOCH) + _c(i)) / 1000).cast("bigint")


_DURATION_MS = {
    "ns": 1e-6, "us": 1e-3, "ms": 1.0, "s": 1000.0,
    "m": 60_000.0, "h": 3_600_000.0, "d": 86_400_000.0,
}


@register("parse_duration")
def parse_duration(s) -> Column:
    """parse_duration('5.4ms') → interval day to second — io.airlift.Duration
    grammar (value + unit, optional whitespace)."""
    v = F.regexp_extract(_c(s), r"^\s*([0-9]*\.?[0-9]+)\s*([a-z]+)\s*$", 1).cast("double")
    unit = F.regexp_extract(_c(s), r"^\s*([0-9]*\.?[0-9]+)\s*([a-z]+)\s*$", 2)
    ms = None
    for u, mult in _DURATION_MS.items():
        clause = v * F.lit(mult)
        ms = F.when(unit == u, clause) if ms is None else ms.when(unit == u, clause)
    return F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), ms / 1000.0)
