"""Harvest the reference's aggregation assertion corpus.

The reference pins aggregate semantics with
``assertAggregation(<function>, <expected>, <input blocks...>)``
(presto-main/src/test/.../operator/aggregation/Test*.java +
AggregationTestUtils.assertAggregation — which replays every input
through single-step, partial/final, and grouped execution paths).
Like compat/scalar_assertions.py, this module parses the Java sources
at run time (nothing copied into the repo) and reconstructs each case
as a one-aggregate SQL query over a VALUES relation, yielding
``(case_id, sql, expected)`` triples.

Harvestable subset: the aggregate name comes from the file's fixed
function (FILE_FN) — every call in these files binds one function —
the expected value must parse with scalar_assertions' literal parser,
and every input must be a literal block builder:

  createLongsBlock / createIntsBlock / createDoublesBlock /
  createBooleansBlock / createStringsBlock (variadic, array-literal,
  or Arrays.asList forms) · createRLEBlock(v, n) (constant argument —
  rendered as a literal, the reference's constant-channel shape) ·
  createTypedLongsBlock(BIGINT, …)

Anything else (mapBlockOf, checksum helpers, programmatic
AbstractTestAggregationFunction sequences) is skipped and counted.
"""

from __future__ import annotations

import os
import re

from facebook_presto_spark.compat.scalar_assertions import (
    _SKIP,
    _iter_calls,
    _parse_expected,
    _split_args,
)

REF_AGG = ("/root/reference/presto-main/src/test/java/com/facebook/"
           "presto/operator/aggregation")

# file → the single aggregate its assertAggregation calls exercise
FILE_FN = {
    "TestArrayAggregation.java": "array_agg",
    "TestArbitraryAggregation.java": "arbitrary",
    "TestHistogram.java": "histogram",
    "TestMapAggAggregation.java": "map_agg",
    "TestMultimapAggAggregation.java": "multimap_agg",
    "TestApproximatePercentileAggregation.java": "approx_percentile",
    "TestBitwiseAndAggregation.java": "bitwise_and_agg",
    "TestBitwiseOrAggregation.java": "bitwise_or_agg",
    "TestCountIfAggregation.java": "count_if",
}

_BLOCK_TYPES = {
    "createLongsBlock": "BIGINT",
    "createTypedLongsBlock": "BIGINT",
    "createIntsBlock": "INTEGER",
    "createDoublesBlock": "DOUBLE",
    "createBooleansBlock": "BOOLEAN",
    "createStringsBlock": "VARCHAR",
}


def _parse_values(inner: str) -> list | object:
    """Literal list from ``new T[] {…}`` / ``Arrays.asList(…)`` /
    variadic argument text."""
    inner = inner.strip()
    m = re.match(r"new\s+[\w.]+\s*\[\s*\]\s*\{(.*)\}\s*$", inner, re.S)
    if m:
        inner = m.group(1).strip()
    m = re.match(r"(?:Arrays\.asList|asList|ImmutableList\.of)\s*\((.*)\)\s*$",
                 inner, re.S)
    if m:
        inner = m.group(1).strip()
    if not inner:
        return []
    out = []
    for a in _split_args(inner):
        v = _parse_expected(a)
        if v is _SKIP:
            return _SKIP
        out.append(v)
    return out


def _parse_block(text: str):
    """→ ('col', sql_type, [values]) | ('const', literal_sql) | _SKIP"""
    text = text.strip()
    m = re.match(r"(create\w+Block)\s*\((.*)\)\s*$", text, re.S)
    if not m:
        return _SKIP
    name, inner = m.group(1), m.group(2)
    if name == "createRLEBlock":
        args = _split_args(inner)
        if len(args) != 2:
            return _SKIP
        v = _parse_expected(args[0])
        if v is _SKIP or isinstance(v, dict):
            return _SKIP
        return ("const", v)
    if name == "createLongRepeatBlock":
        args = _split_args(inner)
        if len(args) != 2:
            return _SKIP
        v, ln = _parse_expected(args[0]), _parse_expected(args[1])
        if v is _SKIP or not isinstance(ln, int):
            return _SKIP
        return ("col", "BIGINT", [v] * ln)
    if name == "createTypedLongsBlock":
        args = _split_args(inner)
        if len(args) != 2 or args[0].strip() != "BIGINT":
            return _SKIP
        vals = _parse_values(args[1])
        return _SKIP if vals is _SKIP else ("col", "BIGINT", vals)
    t = _BLOCK_TYPES.get(name)
    if t is None:
        return _SKIP
    vals = _parse_values(inner)
    return _SKIP if vals is _SKIP else ("col", t, vals)


def _lit(v, t: str) -> str:
    if v is None:
        return f"CAST(NULL AS {t})"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return f"CAST({v} AS {t})"


def _const_lit(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, list):
        return "ARRAY[" + ", ".join(_const_lit(e) for e in v) + "]"
    return str(v)


def _build_sql(fn: str, blocks: list) -> str | object:
    cols = [b for b in blocks if b[0] == "col"]
    if not cols:
        return _SKIP
    nrows = len(cols[0][2])
    if any(len(c[2]) != nrows for c in cols):
        return _SKIP
    # argument list in block order; constants render as literals
    args = []
    ci = 0
    for b in blocks:
        if b[0] == "col":
            args.append(f"c{ci}")
            ci += 1
        else:
            args.append(_const_lit(b[1]))
    call = f"{fn}({', '.join(args)})"
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    if nrows == 0:
        src = ", ".join(
            f"CAST(NULL AS {c[1]}) AS c{i}" for i, c in enumerate(cols))
        return f"SELECT {call} AS r FROM (SELECT {src} WHERE false)"
    rows = ", ".join(
        "(" + ", ".join(_lit(c[2][r], c[1]) for c in cols) + ")"
        for r in range(nrows))
    return f"SELECT {call} AS r FROM (VALUES {rows}) t({names})"


def harvest_agg() -> tuple[list[tuple[str, str, object]], dict[str, int]]:
    """→ ([(case_id, sql, expected)], {file: skipped})."""
    cases: list[tuple[str, str, object]] = []
    skipped: dict[str, int] = {}
    for fname, fn in FILE_FN.items():
        path = os.path.join(REF_AGG, fname)
        if not os.path.exists(path):
            continue
        base = fname.removesuffix(".java")
        src = open(path, encoding="utf-8").read()
        n_skip = 0
        for idx, (argtext, expects_throw) in enumerate(
                _iter_calls(src, "assertAggregation")):
            args = _split_args(argtext)
            if expects_throw or len(args) < 3:
                n_skip += 1
                continue
            expected = _parse_expected(args[1])
            if expected is _SKIP:
                n_skip += 1
                continue
            blocks = [_parse_block(a) for a in args[2:]]
            if any(b is _SKIP for b in blocks):
                n_skip += 1
                continue
            sql = _build_sql(fn, blocks)
            if sql is _SKIP:
                n_skip += 1
                continue
            cases.append((f"{base}#{idx}", sql, expected))
        skipped[base] = n_skip
    return cases, skipped
