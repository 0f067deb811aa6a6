"""Harvest the reference's scalar-function assertion corpora.

The reference pins its scalar surface with thousands of
``assertFunction("<presto expr>", <type>, <expected java literal>)``
cases (presto-main/src/test/.../operator/scalar/Test*.java and
type/Test{Array,Map}Operators.java — e.g. TestArrayOperators.java:134).
Those expected values are the reference's OWN ground truth — stronger
evidence than a DuckDB stand-in — so this module parses the Java
sources at run time (same pattern as compat/abstract_queries.py: the
corpus text stays in the reference tree, nothing is copied into the
repo) and yields ``(case_id, sql_expr, expected)`` triples for every
case whose expected value is in the literal subset we can faithfully
interpret:

  null · booleans · int/long (incl. hex and _ separators) · doubles
  (incl. E-notation, Double.NaN/±Infinity) · Java string literals
  (escapes + adjacent-literal concatenation) · ImmutableList.of /
  Arrays.asList / asList (recursive) · ImmutableMap.of (recursive)

Casts like ``(Integer) null`` are stripped.  Anything else — Slice
factories, sqlTimestampOf, SqlDecimal builders, domain objects — is
skipped and counted, never silently mis-parsed.
"""

from __future__ import annotations

import os
import re

REF_TEST = "/root/reference/presto-main/src/test/java/com/facebook/presto"

# corpora whose expression surface this engine claims (SURVEY §2.2);
# datetime files are excluded: their expected values are session-zone
# objects built by helpers, not literals
FILES = [
    f"{REF_TEST}/type/TestArrayOperators.java",
    f"{REF_TEST}/type/TestMapOperators.java",
    f"{REF_TEST}/operator/scalar/TestStringFunctions.java",
    f"{REF_TEST}/operator/scalar/TestMathFunctions.java",
    f"{REF_TEST}/operator/scalar/TestBitwiseFunctions.java",
    f"{REF_TEST}/operator/scalar/TestConditions.java",
    f"{REF_TEST}/operator/scalar/TestZipFunction.java",
    f"{REF_TEST}/operator/scalar/TestZipWithFunction.java",
    f"{REF_TEST}/operator/scalar/TestMapZipWithFunction.java",
    f"{REF_TEST}/operator/scalar/TestMapFilterFunction.java",
    f"{REF_TEST}/operator/scalar/TestMapTransformKeyFunction.java",
    f"{REF_TEST}/operator/scalar/TestMapTransformValueFunction.java",
    f"{REF_TEST}/operator/scalar/TestArrayFilterFunction.java",
    f"{REF_TEST}/operator/scalar/TestArrayTransformFunction.java",
    f"{REF_TEST}/operator/scalar/TestArrayReduceFunction.java",
    f"{REF_TEST}/operator/scalar/TestArrayNgramsFunction.java",
    f"{REF_TEST}/operator/scalar/TestArrayExceptFunction.java",
    f"{REF_TEST}/operator/scalar/TestRegexpFunctions.java",
    f"{REF_TEST}/operator/scalar/TestJsonFunctions.java",
    f"{REF_TEST}/operator/scalar/TestUrlFunctions.java",
    f"{REF_TEST}/operator/scalar/TestTryFunction.java",
    f"{REF_TEST}/operator/scalar/TestTypeOfFunction.java",
    f"{REF_TEST}/operator/scalar/TestLambdaExpression.java",
]

_NAN = float("nan")
_SKIP = object()  # sentinel: expected literal outside the subset


def _java_unescape(body: str) -> str:
    out = []
    i = 0
    n = len(body)
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n:
            e = body[i + 1]
            if e == "u" and i + 5 < n:
                cp = int(body[i + 2:i + 6], 16)
                i += 6
                # recombine a surrogate pair (Java escapes supplementary
                # characters as two \uXXXX units; a lone surrogate would
                # be unencodable in Python/UTF-8)
                if 0xD800 <= cp <= 0xDBFF and body[i:i + 2] == "\\u" \
                        and i + 5 < n + 6:
                    lo = int(body[i + 2:i + 6], 16)
                    if 0xDC00 <= lo <= 0xDFFF:
                        cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                        i += 6
                out.append(chr(cp))
                continue
            out.append({"n": "\n", "t": "\t", "r": "\r", "b": "\b",
                        "f": "\f", "0": "\0", "'": "'", '"': '"',
                        "\\": "\\"}.get(e, e))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _split_args(text: str) -> list[str]:
    """Split Java argument text on top-level commas (string-aware)."""
    parts = []
    depth = 0
    cur = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == '"':
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == '"':
                    break
                j += 1
            cur.append(text[i:j + 1])
            i = j + 1
            continue
        if c == "'":  # char literal
            j = i + 1
            while j < n and not (text[j] == "'" and text[j - 1] != "\\"):
                j += 1
            cur.append(text[i:j + 1])
            i = j + 1
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return parts


_CAST_RE = re.compile(
    r"^\(\s*[A-Za-z_][\w.<>\[\], ?]*\s*\)\s*(?=[\w\"'(-])")
_INT_RE = re.compile(r"^[+-]?(?:0x[0-9a-fA-F_]+|\d[\d_]*)[Ll]?$")
_DBL_RE = re.compile(
    r"^[+-]?(?:\d[\d_]*\.\d*|\.\d+|\d[\d_]*)(?:[eE][+-]?\d+)?[dDfF]?$")


def _parse_java_string(t: str) -> str | object:
    """One or more '+'-joined Java string literals → Python str."""
    pieces = _split_plus(t)
    out = []
    for p in pieces:
        p = p.strip()
        if not (len(p) >= 2 and p[0] == '"' and p[-1] == '"'):
            return _SKIP
        out.append(_java_unescape(p[1:-1]))
    return "".join(out)


def _split_plus(text: str) -> list[str]:
    parts = []
    depth = 0
    cur = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == '"':
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == '"':
                    break
                j += 1
            cur.append(text[i:j + 1])
            i = j + 1
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "+" and depth == 0:
            parts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


def _parse_expected(t: str):
    t = t.strip()
    while True:
        m = _CAST_RE.match(t)
        if not m:
            break
        t = t[m.end():].strip()
    if t == "null":
        return None
    if t in ("true", "Boolean.TRUE"):
        return True
    if t in ("false", "Boolean.FALSE"):
        return False
    if t == "Double.NaN":
        return _NAN
    if t == "Double.POSITIVE_INFINITY":
        return float("inf")
    if t == "Double.NEGATIVE_INFINITY":
        return float("-inf")
    if t == "Long.MAX_VALUE":
        return 2**63 - 1
    if t == "Long.MIN_VALUE":
        return -(2**63)
    if t == "Integer.MAX_VALUE":
        return 2**31 - 1
    if t == "Integer.MIN_VALUE":
        return -(2**31)
    if t.startswith('"'):
        return _parse_java_string(t)
    if _INT_RE.match(t):
        body = t.rstrip("Ll").replace("_", "")
        return int(body, 16) if body.lower().startswith(("0x", "-0x")) \
            else int(body)
    if _DBL_RE.match(t) and any(ch in t for ch in ".eEdDfF"):
        return float(t.rstrip("dDfF").replace("_", ""))
    for head in ("ImmutableList.of", "Arrays.asList", "asList", "List.of"):
        if t.startswith(head + "(") and t.endswith(")"):
            inner = t[len(head) + 1:-1].strip()
            if not inner:
                return []
            vals = [_parse_expected(a) for a in _split_args(inner)]
            return _SKIP if any(v is _SKIP for v in vals) else vals
    for head in ("ImmutableMap.of", "Map.of"):
        if t.startswith(head + "(") and t.endswith(")"):
            inner = t[len(head) + 1:-1].strip()
            if not inner:
                return {}
            args = [_parse_expected(a) for a in _split_args(inner)]
            if any(v is _SKIP for v in args) or len(args) % 2:
                return _SKIP
            keys = args[0::2]
            if any(isinstance(k, (list, dict)) or k is None for k in keys):
                return _SKIP  # unhashable/NULL keys
            return dict(zip(keys, args[1::2]))
    return _SKIP


def _iter_calls(src: str, name: str):
    """Yield the full argument text of every ``name(...)`` call."""
    start = 0
    while True:
        i = src.find(name + "(", start)
        if i < 0:
            return
        j = i + len(name)
        depth = 0
        k = j
        n = len(src)
        while k < n:
            c = src[k]
            if c == '"':
                k += 1
                while k < n:
                    if src[k] == "\\":
                        k += 2
                        continue
                    if src[k] == '"':
                        break
                    k += 1
            elif c == "'":
                k += 1
                while k < n and not (src[k] == "'" and src[k - 1] != "\\"):
                    k += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        # a call immediately followed by fail(...) sits inside a
        # try { assertFunction(...); fail(...); } block — the REFERENCE
        # expects it to THROW (TestArrayOperators.java:450-456 et al.);
        # these are not value assertions and must not enter the corpus
        tail = src[k + 1:k + 80].lstrip()
        expects_throw = tail.startswith(";") and \
            tail[1:].lstrip().startswith("fail(")
        yield src[j + 1:k], expects_throw
        start = k + 1


def harvest() -> tuple[list[tuple[str, str, object]], dict[str, int]]:
    """→ ([(case_id, presto_expr, expected)], {file: skipped_count})."""
    cases: list[tuple[str, str, object]] = []
    skipped: dict[str, int] = {}
    for path in FILES:
        if not os.path.exists(path):
            continue
        base = os.path.basename(path).removesuffix(".java")
        src = open(path, encoding="utf-8").read()
        n_skip = 0
        for idx, (argtext, expects_throw) in enumerate(
                _iter_calls(src, "assertFunction")):
            args = _split_args(argtext)
            if expects_throw or len(args) != 3:
                n_skip += 1
                continue
            expr = _parse_java_string(args[0])
            if expr is _SKIP:
                n_skip += 1
                continue
            expected = _parse_expected(args[2])
            if expected is _SKIP:
                n_skip += 1
                continue
            cases.append((f"{base}#{idx}", expr, expected))
        skipped[base] = n_skip
    return cases, skipped


def match(got, want, *, rel=1e-9) -> bool:
    """Tolerant typed compare of an engine value vs the parsed Java
    expected literal (floats: exact-or-1e-9-relative; dicts: unordered
    with numeric-equal keys)."""
    import math

    if want is None or got is None:
        return got is None and want is None
    if isinstance(want, bool) or isinstance(got, bool):
        return got is want
    if isinstance(want, float) or isinstance(got, float):
        try:
            g, w = float(got), float(want)
        except (TypeError, ValueError):
            return False
        if math.isnan(w):
            return math.isnan(g)
        if math.isinf(w) or math.isinf(g) or math.isnan(g):
            # non-finite got vs finite want must not fall into the
            # relative test (inf - w <= rel * inf is vacuously true)
            return g == w
        return g == w or abs(g - w) <= rel * max(abs(g), abs(w))
    if isinstance(want, int):
        try:
            return int(got) == want and float(got) == float(want)
        except (TypeError, ValueError):
            return False
    if isinstance(want, str):
        return isinstance(got, str) and got == want
    if isinstance(want, list):
        if not isinstance(got, list) or len(got) != len(want):
            return False
        return all(match(g, w, rel=rel) for g, w in zip(got, want))
    if isinstance(want, dict):
        if not isinstance(got, dict) or len(got) != len(want):
            return False
        for wk, wv in want.items():
            hit = next((gk for gk in got if match(gk, wk, rel=rel)), None)
            if hit is None or not match(got[hit], wv, rel=rel):
                return False
        return True
    return got == want


def to_py(v):
    """Engine Row cell → plain python for match()."""
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        f = float(v)
        return int(f) if f.is_integer() and abs(f) < 2**53 else f
    if isinstance(v, (list, tuple)):
        return [to_py(x) for x in v]
    if isinstance(v, dict):
        return {to_py(k): to_py(x) for k, x in v.items()}
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    return v
