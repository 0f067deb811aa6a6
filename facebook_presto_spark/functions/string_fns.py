"""String + regex function library.

Reference: presto-main/.../operator/scalar/StringFunctions.java (840 LoC,
registered FunctionRegistry.java:474), JoniRegexpFunctions.java (311 LoC),
WordStemFunction.java.  Registered under the reference's names; bodies are
Spark built-ins except where noted.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# --- direct built-ins ------------------------------------------------------
register("length")(lambda s: F.length(_c(s)))
register("lower")(lambda s: F.lower(_c(s)))
register("upper")(lambda s: F.upper(_c(s)))
register("reverse")(lambda s: F.reverse(_c(s)))
register("trim")(lambda s, chars=None: F.trim(_c(s)) if chars is None else F.btrim(_c(s), F.lit(chars)))
register("ltrim")(lambda s: F.ltrim(_c(s)))
register("rtrim")(lambda s: F.rtrim(_c(s)))
register("concat")(lambda *cols: F.concat(*[_c(c) for c in cols]))
register("replace")(
    lambda s, search, repl="": F.replace(_c(s), F.lit(search), F.lit(repl))
)
register("split")(lambda s, delim, limit=-1: F.split(_c(s), F.lit(delim).cast("string"), limit))
register("split_part")(
    # reference: 1-based, returns NULL past the end — matches Spark element_at
    # on the split array with try semantics.
    lambda s, delim, index: F.try_element_at(F.split(_c(s), delim), F.lit(index))
)
register("strpos")(lambda s, sub: F.instr(_c(s), sub).cast("bigint"))
register("position")(lambda sub, s: F.instr(_c(s), sub).cast("bigint"))
register("substr")(
    lambda s, start, length=None: F.substring(_c(s), start, length)
    if length is not None
    else _c(s).substr(F.lit(start), F.length(_c(s)))
)
register("lpad")(lambda s, n, pad=" ": F.lpad(_c(s), n, pad))
register("rpad")(lambda s, n, pad=" ": F.rpad(_c(s), n, pad))
register("chr")(lambda n: F.char(_c(n)))
register("codepoint")(lambda s: F.ascii(_c(s)))
register("levenshtein_distance")(lambda a, b: F.levenshtein(_c(a), _c(b)).cast("bigint"))
register("starts_with")(lambda s, p: F.startswith(_c(s), _c(p)))
register("ends_with")(lambda s, p: F.endswith(_c(s), _c(p)))
register("translate")(lambda s, frm, to: F.translate(_c(s), frm, to))
register("from_utf8")(lambda b: F.decode(_c(b), "utf-8"))
register("to_utf8")(lambda s: F.encode(_c(s), "utf-8"))


# hamming_distance (StringFunctions.java): count of differing code points of
# equal-length strings — composed from HOFs, stays in codegen.
@register("hamming_distance")
def hamming_distance(a, b) -> Column:
    a, b = _c(a), _c(b)
    pairs = F.zip_with(F.split(a, ""), F.split(b, ""), lambda x, y: (x != y).cast("int"))
    return F.aggregate(pairs, F.lit(0), lambda acc, v: acc + v).cast("bigint")


# split_to_map (StringFunctions.java splitToMap): 'a=1,b=2' → map.
@register("split_to_map")
def split_to_map(s, entry_delim, kv_delim) -> Column:
    return F.str_to_map(_c(s), F.lit(entry_delim), F.lit(kv_delim))


# normalize(s, NFC|NFD|NFKC|NFKD) — no JVM surface in Spark; Arrow UDF.
@register("normalize", slow_path=True)
def normalize(s, form: str = "NFC") -> Column:
    form = form.upper()

    @F.pandas_udf(StringType())
    def _norm(col: pd.Series) -> pd.Series:
        return col.map(lambda v: None if v is None else unicodedata.normalize(form, v))

    return _norm(_c(s))


# word_stem (WordStemFunction.java — Porter).  Simplified Porter suffix
# stripping, vectorized over Arrow batches; module-level UDF object so the
# engine can also register it for SQL text.
_STEM_SUFFIXES = ("ational", "iveness", "fulness", "ousness", "ization",
                  "ations", "ement", "ments", "ation", "ness", "ing", "edly",
                  "ed", "ies", "ly", "es", "s")


def _stem_word(w):
    if w is None:
        return None
    for suf in _STEM_SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


@F.pandas_udf(StringType())
def _word_stem_udf(col: pd.Series) -> pd.Series:
    return col.map(_stem_word)


register("word_stem", slow_path=True)(lambda s: _word_stem_udf(_c(s)))


@F.pandas_udf(StringType())
def _normalize_udf(col: pd.Series, form: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if v is None else unicodedata.normalize(f or "NFC", v)
            for v, f in zip(col, form)
        ]
    )


@F.pandas_udf(BooleanType())
def _json_array_contains_udf(js: pd.Series, kind: pd.Series,
                             val: pd.Series) -> pd.Series:
    """json_array_contains with the reference's TYPED matching
    (JsonFunctions.java jsonArrayContains overloads): a bigint probe
    matches only integral JSON numbers, a double probe only float
    tokens, booleans/varchars their own kinds — and a malformed or
    non-array input is NULL."""
    import json as _json

    def one(j, k, v):
        if j is None or v is None:
            return None
        try:
            arr = _json.loads(j)
        except Exception:
            return None
        if not isinstance(arr, list):
            return None
        for el in arr:
            if k == "b" and isinstance(el, bool) and el is (v == "true"):
                return True
            if k == "l" and type(el) is int and el == int(v):
                return True
            if k == "d" and type(el) is float and el == float(v):
                return True
            if k == "s" and isinstance(el, str) and not isinstance(el, bool)                     and el == v:
                return True
        return False

    return pd.Series([one(j, k, v) for j, k, v in zip(js, kind, val)],
                     dtype="object")


@F.pandas_udf(StringType())
def _presto_typeof_udf(t: pd.Series) -> pd.Series:
    """Spark typeof() text → the reference's type spelling
    (TypeOfFunction.java renders StandardTypes names: integer, varchar,
    array(…)); shared with information_schema via presto_type_name."""
    from facebook_presto_spark.infoschema import presto_type_name

    def one(x):
        if x is None:
            return None
        if x == "void":
            return "unknown"
        out = presto_type_name(x)
        # typeof() of a plain timestamp value is just 'timestamp' (the
        # info-schema mapping widens it for column metadata)
        return "timestamp" if out == "timestamp with time zone" else out

    return t.map(one)


def _java_re(p: str) -> str:
    """Java/Joni pattern → Python re (named groups ``(?<n>`` →
    ``(?P<n>``; lookbehind/lookahead spellings are shared)."""
    import re as _re

    return _re.sub(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", r"(?P<\1>", p)


@F.pandas_udf(StructType([
    StructField("segs", ArrayType(StringType())),
    StructField("grps", ArrayType(ArrayType(StringType()))),
]))
def _regexp_segments_udf(ss: pd.Series, ps: pd.Series) -> pd.DataFrame:
    """Split ``s`` around every match of ``p``: ``segs`` holds the
    n+1 non-matching segments, ``grps`` one capture-group array per
    match (NULL for non-participating groups; the whole match when the
    pattern has no groups).  Backs the reference's lambda-replacement
    regexp_replace (JoniRegexpFunctions.java regexpReplace(x, p,
    function)) — the SQL layer applies the lambda to each group array
    and reassembles, so the lambda itself stays a Catalyst expression.
    """
    import re as _re

    segs_out, grps_out = [], []
    for s, p in zip(ss, ps):
        if s is None or p is None:
            segs_out.append(None)
            grps_out.append(None)
            continue
        rx = _re.compile(_java_re(p))
        segs, grps = [], []
        last = 0
        for m in rx.finditer(s):
            segs.append(s[last:m.start()])
            if rx.groups:
                grps.append([m.group(g + 1) for g in range(rx.groups)])
            else:
                grps.append([m.group(0)])
            last = m.end()
        segs.append(s[last:])
        segs_out.append(segs)
        grps_out.append(grps)
    return pd.DataFrame({"segs": segs_out, "grps": grps_out})


def _parse_ptype(t: str):
    """Parse a Presto type text (paren or angle generics) into a tree."""
    t = t.strip()
    low = t.lower()
    for head in ("array", "map", "row"):
        if low.startswith(head):
            rest = t[len(head):].strip()
            if rest[:1] in ("(", "<"):
                inner = rest[1:-1]
                parts, depth, cur = [], 0, []
                for ch in inner:
                    if ch in "(<":
                        depth += 1
                    elif ch in ")>":
                        depth -= 1
                    if ch == "," and depth == 0:
                        parts.append("".join(cur))
                        cur = []
                    else:
                        cur.append(ch)
                parts.append("".join(cur))
                if head == "array":
                    return ("array", _parse_ptype(parts[0]))
                if head == "map":
                    return ("map", _parse_ptype(parts[0]),
                            _parse_ptype(parts[1]))
                fields = []
                for fi, p in enumerate(parts):
                    p = p.strip()
                    first = p.split(None, 1)[0].lower() if p else ""
                    bases = ("tinyint", "smallint", "int", "integer",
                             "bigint", "double", "real", "boolean",
                             "varchar", "char", "json", "decimal", "date",
                             "timestamp", "array", "map", "row", "unknown")
                    if " " in p and first not in bases:
                        name, ft = p.split(None, 1)
                        fields.append((name.lower(), _parse_ptype(ft)))
                    else:
                        fields.append((f"col{fi + 1}", _parse_ptype(p)))
                return ("row", fields)
    return ("scalar", low.split("(")[0].strip())


def _json_coerce(v, t):
    """Presto JSON→typed coercion (JsonUtil.java value writers):
    cross-token casts — numbers from strings, booleans from numbers,
    HALF_UP integer rounding, NaN/Infinity double texts."""
    import math

    kind = t[0]
    if kind == "scalar" and t[1] == "json":
        import json as _json

        return _json.dumps(v, separators=(",", ":"), allow_nan=True)
    if v is None:
        return None
    if kind == "array":
        if not isinstance(v, list):
            raise ValueError("not a JSON array")
        return [_json_coerce(e, t[1]) for e in v]
    if kind == "map":
        if not isinstance(v, dict):
            raise ValueError("not a JSON object")
        return {k: _json_coerce(e, t[2]) for k, e in v.items()}
    if kind == "row":
        fields = t[1]
        if isinstance(v, list):
            vals = list(v) + [None] * (len(fields) - len(v))
            return {n: _json_coerce(vals[i], ft)
                    for i, (n, ft) in enumerate(fields)}
        if isinstance(v, dict):
            low = {k.lower(): x for k, x in v.items()}
            return {n: _json_coerce(low.get(n), ft) for n, ft in fields}
        raise ValueError("not a JSON array/object")
    base = t[1]
    if base == "boolean":
        if isinstance(v, bool):
            return v
        if isinstance(v, (int, float)):
            return v != 0
        if v in ("true", "false"):
            return v == "true"
        raise ValueError("bad boolean")
    if base in ("tinyint", "smallint", "int", "integer", "bigint"):
        if isinstance(v, bool):
            return 1 if v else 0
        if isinstance(v, int):
            return v
        if isinstance(v, str):
            try:
                return int(v)
            except ValueError:
                v = float(v)
        # Math.round (HALF_UP toward +inf), like DoubleOperators
        return int(math.floor(float(v) + 0.5))
    if base in ("double", "real", "decimal"):
        if isinstance(v, bool):
            out = 1.0 if v else 0.0
        else:
            out = float(v)
        if base == "real":
            import numpy as _np

            out = float(_np.float32(out))
        return out
    # varchar/char and the rest: text
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return v


@F.pandas_udf(StringType())
def _json_coerce_udf(js: pd.Series, ts: pd.Series) -> pd.Series:
    """Re-serialize JSON text so its token kinds match the target type
    (second arg: Presto type text) — from_json then parses it exactly.
    NULL/invalid/uncoercible input → NULL (the TRY-suppressed path; the
    reference raises on uncoercible values — documented permissive
    divergence shared with from_json)."""
    import json as _json

    def one(j, t):
        if j is None:
            return None
        try:
            return _json.dumps(
                _json_coerce(_json.loads(j), _parse_ptype(t)),
                separators=(",", ":"), allow_nan=True)
        except Exception:
            return None

    return pd.Series([one(j, t) for j, t in zip(js, ts)], dtype="object")


SQL_UDFS = {"word_stem": _word_stem_udf, "presto_normalize": _normalize_udf,
            "presto_json_coerce": _json_coerce_udf,
            "presto_json_array_contains": _json_array_contains_udf,
            "presto_typeof_name": _presto_typeof_udf,
            "presto_regexp_segments": _regexp_segments_udf}


# --- regex (Joni-engine semantics ≈ Java regex for the common surface) -----
register("regexp_like")(lambda s, p: _c(s).rlike(p))
register("regexp_extract")(lambda s, p, group=1: F.regexp_extract(_c(s), p, group))
register("regexp_extract_all")(
    lambda s, p, group=1: F.regexp_extract_all(_c(s), F.lit(p), F.lit(group))
)
register("regexp_replace")(lambda s, p, repl="": F.regexp_replace(_c(s), p, repl))
register("regexp_split")(lambda s, p: F.split(_c(s), p))
register("regexp_count")(lambda s, p: F.regexp_count(_c(s), F.lit(p)))


# ANSI alias of substr (grammar SqlBase.g4 primaryExpression SUBSTRING(x FROM s FOR n)).
register("substring")(
    lambda s, start, length=None: F.substring(_c(s), start, length)
    if length is not None
    else _c(s).substr(F.lit(start), F.length(_c(s)))
)


# split_to_multimap (StringFunctions.java splitToMultimap):
# 'a=1,a=2,b=3' → {a: [1,2], b: [3]} — duplicate keys collect into arrays.
@register("split_to_multimap")
def split_to_multimap(s, entry_delim, kv_delim) -> Column:
    entries = F.split(_c(s), entry_delim)
    keys = F.array_distinct(
        F.transform(entries, lambda e: F.split_part(e, F.lit(kv_delim), F.lit(1)))
    )
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.transform(
                F.filter(entries, lambda e: F.split_part(e, F.lit(kv_delim), F.lit(1)) == k),
                lambda e: F.split_part(e, F.lit(kv_delim), F.lit(2)),
            ),
        ),
    )
