"""Teradata compatibility functions (presto-teradata-functions plugin).

Reference: presto-teradata-functions/src/main/java/com/facebook/presto/
teradata/functions/TeradataStringFunctions.java (index:34, char2hexint:109)
and TeradataDateFunctions.java (to_char:61, to_date:77, to_timestamp:93),
with the Teradata date-format tokens defined in
dateformat/DateFormatParser.java:44-82 (DD, HH, HH24, MI, MM, SS, YY,
YYYY + literal separators).

All implementations are pure Catalyst expressions; the Teradata format
string is translated to a Java/Spark datetime pattern at plan time (the
reference builds a Joda formatter from the same token stream).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# Teradata token → Java datetime pattern (DateFormatParser.java:44-82).
# Longest-match-first: HH24 before HH, YYYY before YY.
_TOKENS = [
    ("YYYY", "yyyy"),
    ("YY", "yy"),
    ("MM", "MM"),
    ("DD", "dd"),
    ("HH24", "HH"),
    ("HH", "hh"),
    ("MI", "mm"),
    ("SS", "ss"),
]
_TOKEN_RE = re.compile(
    "|".join(t for t, _ in sorted(_TOKENS, key=lambda x: -len(x[0]))),
    re.IGNORECASE,
)


def teradata_format_to_java(fmt: str) -> str:
    """Translate a Teradata date format to a Spark datetime pattern.

    Unrecognized alphabetic runs raise (the reference's UNRECOGNIZED token
    → INVALID_FUNCTION_ARGUMENT); separators pass through, quoted when
    they could collide with pattern letters.
    """
    mapping = {t.upper(): j for t, j in _TOKENS}
    out: list[str] = []
    i = 0
    while i < len(fmt):
        m = _TOKEN_RE.match(fmt, i)
        if m:
            out.append(mapping[m.group(0).upper()])
            i = m.end()
            continue
        ch = fmt[i]
        if ch.isalpha():
            raise ValueError(
                f"Failed to tokenize string [{ch}] at offset [{i}]"
            )
        out.append(f"'{ch}'" if ch == "'" else ch)
        i += 1
    return "".join(out)


def _fmt(format_string) -> str:
    if isinstance(format_string, str):
        return teradata_format_to_java(format_string)
    raise ValueError(
        "Teradata to_char/to_date/to_timestamp need a literal format string"
    )


@register("to_char")
def to_char(ts, format_string) -> Column:
    """to_char(timestamp, format) — TeradataDateFunctions.java:61."""
    return F.date_format(_c(ts), _fmt(format_string))


@register("to_date")
def to_date(s, format_string) -> Column:
    """to_date(varchar, format) — TeradataDateFunctions.java:77."""
    return F.to_date(_c(s), _fmt(format_string))


@register("to_timestamp")
def to_timestamp(s, format_string) -> Column:
    """to_timestamp(varchar, format) — TeradataDateFunctions.java:93."""
    return F.to_timestamp(_c(s), _fmt(format_string))


@register("index")
def index(string, substring) -> Column:
    """index(string, substring) — 1-based position, 0 when absent
    (TeradataStringFunctions.java:34, delegating to strpos)."""
    return F.instr(_c(string), _c(substring)).cast("bigint")


@register("char2hexint")
def char2hexint(s) -> Column:
    """char2hexint(varchar) — uppercase hex of the UTF-16BE encoding
    (TeradataStringFunctions.java:109)."""
    return F.upper(F.hex(F.encode(_c(s), "UTF-16BE")))
