"""Per-function translation rules: Presto call → Spark SQL tokens.

Covers the scalar/aggregate surface of ``presto-main/.../metadata/
FunctionRegistry.java:418-665`` where the Spark spelling differs. Functions
whose name and argument order already match Spark (the majority — SURVEY.md
§2.2) need no entry and pass through untouched.

Each rule takes the list of already-translated argument token lists and
returns replacement tokens. ``RENAME`` entries are plain name swaps.
"""

from __future__ import annotations

import re

from facebook_presto_spark.sqlfront.tokens import (
    Tok,
    find_matching_paren,
    ident,
    op,
    split_top_level,
    string_literal,
    string_value,
    tokenize,
)

Args = list[list[Tok]]

# ---------------------------------------------------------------------------
# plain renames (same argument order/semantics)
# ---------------------------------------------------------------------------
RENAME: dict[str, str] = {
    # ROW constructor (RowType.java) — the ROW *type* in CAST targets is
    # already rewritten to STRUCT<> by translate._pass_cast_types
    "row": "struct",
    # string (StringFunctions.java)
    "strpos": "instr",
    "codepoint": "ascii",
    "levenshtein_distance": "levenshtein",
    # binary (VarbinaryFunctions.java)
    "to_hex": "hex",
    "from_hex": "unhex",
    "to_base64": "base64",
    "from_base64": "unbase64",
    # array (Array*.java)
    "repeat": "array_repeat",
    # json (JsonFunctions.java)
    "json_extract": "get_json_object",
    "json_extract_scalar": "get_json_object",
    # aggregates (operator/aggregation/)
    "approx_distinct": "approx_count_distinct",
    # HyperLogLog surface (ApproximateSetAggregation.java,
    # MergeHyperLogLogAggregation.java): the SQL path rides Spark's
    # DataSketches HLL family (sketch values engine-defined, estimates
    # within the same error class); the Presto-WIRE-format twins live on
    # the DataFrame path (functions/presto_hll_spark.py).  ``merge`` in
    # the reference is generic over sketch types; the only sketch type
    # that reaches the SQL path as a value is HLL, so the HLL reading is
    # the sound one here.
    "approx_set": "hll_sketch_agg",
    "merge": "hll_union_agg",
    "format": "format_string",
    # Joda-pattern formatting ≈ JDK DateTimeFormatter for the shared
    # token subset (yyyy/MM/dd/HH/mm/ss…)
    "format_datetime": "date_format",
    "bitwise_and_agg": "bit_and",
    "bitwise_or_agg": "bit_or",
    # math (MathFunctions.java)
    # datetime (DateTimeFunctions.java)
    "day_of_year": "dayofyear",
    "doy": "dayofyear",
    "week": "weekofyear",
    "week_of_year": "weekofyear",
    "last_day_of_month": "last_day",
    "from_iso8601_timestamp": "to_timestamp",
    "from_iso8601_date": "to_date",
    "parse_datetime": "to_timestamp",  # Joda patterns ≈ Java patterns for common cases
    # map/string (MapFunctions, StringFunctions)
}

# Presto date/time unit strings → Spark timestampadd/timestampdiff keywords
_UNITS = {
    "millisecond": "MILLISECOND",
    "second": "SECOND",
    "minute": "MINUTE",
    "hour": "HOUR",
    "day": "DAY",
    "week": "WEEK",
    "month": "MONTH",
    "quarter": "QUARTER",
    "year": "YEAR",
}

# MySQL %-format (Presto date_format/date_parse — DateTimeFunctions.java,
# @Description "MySQL date format") → Java SimpleDateFormat pattern.
_MYSQL_FMT = {
    "a": "EEE", "b": "MMM", "c": "M", "d": "dd", "e": "d", "f": "SSSSSS",
    "H": "HH", "h": "hh", "I": "hh", "i": "mm", "j": "DDD", "k": "H",
    "l": "h", "M": "MMMM", "m": "MM", "p": "a", "r": "hh:mm:ss a",
    "S": "ss", "s": "ss", "T": "HH:mm:ss", "v": "ww", "W": "EEEE",
    "Y": "yyyy", "y": "yy", "%": "%",
}


def mysql_to_java_format(fmt: str) -> str:
    """'%Y-%m-%d %H:%i' → 'yyyy-MM-dd HH:mm' (literal letters get quoted)."""
    out: list[str] = []
    literal: list[str] = []

    def flush() -> None:
        if literal:
            run = "".join(literal)
            if re.search(r"[A-Za-z']", run):
                out.append("'" + run.replace("'", "''") + "'")
            else:
                out.append(run)
            literal.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            spec = fmt[i + 1]
            if spec not in _MYSQL_FMT:
                raise ValueError(f"unsupported MySQL datetime format %{spec}")
            flush()
            if spec == "%":
                literal.append("%")
            else:
                out.append(_MYSQL_FMT[spec])
            i += 2
        else:
            literal.append(ch)
            i += 1
    flush()
    return "".join(out)


# ---------------------------------------------------------------------------
# helpers for building token output
# ---------------------------------------------------------------------------

def _call(name: str, *arg_groups: list[Tok]) -> list[Tok]:
    out = [ident(name), op("(")]
    for i, g in enumerate(arg_groups):
        if i:
            out.append(op(","))
        out.extend(g)
    out.append(op(")"))
    return out


def _lit_unit(arg: list[Tok]) -> str | None:
    if len(arg) == 1 and arg[0].kind == "string":
        unit = string_value(arg[0]).lower()
        return _UNITS.get(unit)
    return None


def _paren(toks: list[Tok]) -> list[Tok]:
    return [op("(")] + toks + [op(")")]


# ---------------------------------------------------------------------------
# structural rules
# ---------------------------------------------------------------------------

def _date_add(args: Args) -> list[Tok]:
    # date_add(unit, n, x) → (x + n * INTERVAL '1' unit).  Interval
    # arithmetic preserves Presto's result typing (DateTimeFunctions.java):
    # DATE + year-month/day-time interval stays DATE in Spark, TIMESTAMP
    # stays TIMESTAMP — unlike timestampadd(), which always yields TIMESTAMP.
    unit = _lit_unit(args[0])
    if unit is None or len(args) != 3:
        raise ValueError("date_add requires a literal unit string")
    return _paren(
        args[2] + [op("+")] + _paren(args[1]) + [op("*"), ident("INTERVAL"),
        string_literal("1"), ident(unit)]
    )


def _date_diff(args: Args) -> list[Tok]:
    unit = _lit_unit(args[0])
    if unit is None or len(args) != 3:
        raise ValueError("date_diff requires a literal unit string")
    # Presto: date_diff(unit, t1, t2) = t2 - t1 == timestampdiff(U, t1, t2)
    return _call("timestampdiff", [ident(unit)], args[1], args[2])


def _date_format(args: Args) -> list[Tok]:
    if len(args) == 2 and args[1] and args[1][0].kind == "string":
        java = mysql_to_java_format(string_value(args[1][0]))
        return _call("date_format", args[0], [string_literal(java)])
    raise ValueError("date_format requires a literal MySQL format string")


def _date_parse(args: Args) -> list[Tok]:
    if len(args) == 2 and args[1] and args[1][0].kind == "string":
        java = mysql_to_java_format(string_value(args[1][0]))
        return _call("to_timestamp", args[0], [string_literal(java)])
    raise ValueError("date_parse requires a literal MySQL format string")


def _from_unixtime(args: Args) -> list[Tok]:
    # Presto returns TIMESTAMP; Spark's from_unixtime returns STRING.
    # DateTimeFunctions.java signatures: (unixtime), (unixtime, zone),
    # (unixtime, zone_hours, zone_minutes).
    if len(args) == 1:
        return _call("timestamp_seconds", args[0])
    if len(args) == 2:
        return _call(
            "from_utc_timestamp", _call("timestamp_seconds", args[0]), args[1]
        )
    if len(args) == 3:
        zone = _call(
            "format_string", [string_literal("%+03d:%02d")],
            _call("cast", args[1] + [ident("AS"), ident("INT")]),
            _call("abs", _call("cast", args[2] + [ident("AS"), ident("INT")])),
        )
        return _call(
            "from_utc_timestamp", _call("timestamp_seconds", args[0]), zone
        )
    raise ValueError("from_unixtime takes 1-3 arguments")


def _approx_percentile(args: Args) -> list[Tok]:
    # ApproximateLongPercentileAggregations.java signatures:
    # (x, p) → percentile_approx; weighted (x, w, p[, accuracy]) → Spark's
    # exact percentile(x, p, frequency) — arg order differs, so a plain
    # rename would silently read w as the percentage.  Presto's accuracy
    # knob (relative error) has no Spark twin; the exact result is strictly
    # more accurate, so it is dropped.
    if len(args) == 2:
        return _call("percentile_approx", args[0], args[1])
    if len(args) in (3, 4):
        return _call("percentile", args[0], args[2], args[1])
    raise ValueError("approx_percentile takes 2-4 arguments")


def _sql(template: str, **parts: list[Tok]) -> list[Tok]:
    """Build tokens from a SQL template with ``{name}`` token-list holes."""
    out: list[Tok] = []
    for piece in re.split(r"(\{\w+\})", template):
        if piece.startswith("{") and piece.endswith("}"):
            out.extend(parts[piece[1:-1]])
        elif piece.strip():
            out.extend(tokenize(piece))
    return out


def _teradata_dt(spark_fn: str, args: Args, *, fmt_last: bool) -> list[Tok]:
    # Teradata plugin to_char/to_date/to_timestamp
    # (TeradataDateFunctions.java:61-105): the Teradata format tokens are
    # translated to a Spark pattern at rewrite time.
    from facebook_presto_spark.functions.teradata_fns import (
        teradata_format_to_java,
    )

    if len(args) != 2 or args[1][0].kind != "string":
        raise ValueError(f"{spark_fn}: expected (value, 'literal format')")
    java = teradata_format_to_java(string_value(args[1][0]))
    return _call(spark_fn, args[0], [string_literal(java)])


def _grouping(args: Args) -> list[Tok]:
    # grouping(c1..cn) = Σ grouping(ci) · 2^(n-1-i) — bit i of the Presto
    # bitmask, independent of the GROUP BY column order (which Spark's
    # n-ary grouping_id insists on matching).
    if len(args) == 1:
        return _call("grouping", args[0])
    out: list[Tok] = [op("(")]
    n = len(args)
    for i, a in enumerate(args):
        if i:
            out.append(op("+"))
        out.extend(_call("grouping", a))
        weight = 1 << (n - 1 - i)
        if weight > 1:
            out.extend([op("*"), Tok("number", str(weight))])
    out.append(op(")"))
    return out


def _kurtosis(args: Args) -> list[Tok]:
    # CentralMomentsAggregation.java:71-87: Presto's kurtosis is the
    # bias-corrected sample excess kurtosis G2 (NULL when n < 4); Spark's
    # built-in is the population g2.  Identity:
    # G2 = (n-1) * ((n+1)*g2 + 6) / ((n-2)*(n-3)).
    x = args[0]
    return _sql(
        "(CASE WHEN count({x}) >= 4 THEN"
        " (count({x}) - 1) * ((count({x}) + 1) * kurtosis({x}) + 6)"
        " / ((count({x}) - 2) * (count({x}) - 3)) END)",
        x=x,
    )


def _strip_at_time_zone(arg: list[Tok]) -> tuple[list[Tok], Tok | None]:
    """Split trailing ``AT TIME ZONE <zone>`` off an operand, if present.

    The AT TIME ZONE pass runs after function rules, so inside a function
    argument the construct is still in source form.
    """
    if (
        len(arg) >= 5
        and arg[-4].is_kw("AT") and arg[-3].is_kw("TIME")
        and arg[-2].is_kw("ZONE")
    ):
        return arg[:-4], arg[-1]
    return arg, None


def _timezone_part(args: Args, *, minute: bool) -> list[Tok]:
    # DateTimeFunctions.java timezone_hour/timezone_minute: the signed
    # hour/minute component of the zone offset carried by a
    # timestamp-with-time-zone.  Our zone-less timestamps are UTC instants
    # (session.py), so with an explicit AT TIME ZONE the offset is
    # observable: from_utc_timestamp re-renders the instant as z's wall
    # clock, and the unix_timestamp delta of the two renderings IS the
    # offset.  `div` truncates toward zero and % keeps the dividend's
    # sign, matching Presto for negative offsets (-4:30 → -4, -30).
    x, zone = _strip_at_time_zone(args[0])
    if zone is None:
        return tokenize("CAST(0 AS BIGINT)")  # session zone is UTC
    off = _sql(
        "(unix_timestamp(from_utc_timestamp(CAST({x} AS TIMESTAMP), {z}))"
        " - unix_timestamp(CAST({x} AS TIMESTAMP)))",
        x=x, z=[zone],
    )
    if minute:
        return _sql("(({off} div 60) % 60)", off=off)
    return _sql("({off} div 3600)", off=off)


def _to_unixtime(args: Args) -> list[Tok]:
    # fractional seconds survive a double cast (Spark semantics)
    return _paren(_call("cast", args[0] + [ident("AS"), ident("DOUBLE")]))


def _day_of_week(args: Args) -> list[Tok]:
    # Presto dow: Monday=1..Sunday=7 (ISO); Spark dayofweek: Sunday=1.
    inner = _call("dayofweek", args[0])
    return _paren(
        _paren(_paren(inner + [op("+"), Tok("number", "5")])
               + [op("%"), Tok("number", "7")])
        + [op("+"), Tok("number", "1")]
    )


def _sha2(bits: str):
    # Presto digests return VARBINARY (VarbinaryFunctions.java); Spark's
    # return lowercase hex strings, so unwrap back to bytes with unhex.
    def rule(args: Args) -> list[Tok]:
        return _call("unhex", _call("sha2", args[0], [Tok("number", bits)]))
    return rule


def _digest_binary(spark_name: str):
    def rule(args: Args) -> list[Tok]:
        return _call("unhex", _call(spark_name, args[0]))
    return rule


_NULL = [ident("NULL")]


def _if_fn(args: Args) -> list[Tok]:
    # Presto if(cond, x) has an implicit NULL else branch; Spark's if is
    # strictly ternary
    if len(args) == 2:
        args = [*args, _NULL]
    return _call("if", *args)


def _zip(args: Args) -> list[Tok]:
    """zip(a, b, …) → row(field0, field1, …) per index, padded with NULLs
    to the longest input (ZipFunction.java).  Spark's arrays_zip truncates
    differently and names fields after inputs, so build it explicitly."""
    card = _call("greatest", *[_call("cardinality", a) for a in args]) \
        if len(args) > 1 else _call("cardinality", args[0])
    fields: list[Tok] = []
    for k, a in enumerate(args):
        if k:
            fields.append(op(","))
        fields.extend([string_literal(f"field{k}"), op(",")])
        fields.extend(_call("element_at", a, [ident("__zi")]))
    struct = [ident("named_struct"), op("(")] + fields + [op(")")]
    lam = [ident("__zi"), op("->")] + struct
    seq = _call("sequence", [Tok("number", "1")], card)
    # ANY NULL input nulls the result (scalar-function null convention;
    # greatest-over-cardinalities would silently skip the NULL side)
    cond: list[Tok] = []
    for a in args:
        if cond:
            cond.append(ident("OR"))
        cond += _paren(list(a)) + [ident("IS"), ident("NULL")]
    return (
        [op("("), ident("CASE"), ident("WHEN")] + cond
        + [ident("THEN"), ident("NULL"), ident("ELSE")]
        + _call("transform", seq, lam) + [ident("END"), op(")")]
    )


def _json_size(args: Args) -> list[Tok]:
    # json_size: cardinality of the array/object at path, 0 for scalars,
    # NULL when the path is missing (JsonFunctions.java)
    g = _call("get_json_object", args[0], args[1])
    null_int = [ident("CAST"), op("(")] + _NULL + [ident("AS"), ident("INT"), op(")")]
    scalar = _call("if", _call("isnotnull", g), [Tok("number", "0")], null_int)
    obj = _call(
        "if", _call("startswith", g, [string_literal("{")]),
        _call("size", _call("json_object_keys", g)), scalar,
    )
    return _call(
        "if", _call("startswith", g, [string_literal("[")]),
        _call("json_array_length", g), obj,
    )


def _json_array_contains(args: Args) -> list[Tok]:
    # typed matching like the reference's four overloads
    # (JsonFunctions.java jsonArrayContains): the probe literal's SQL
    # type decides which JSON token kind can match — bigint only
    # integral numbers, double only float tokens, boolean/varchar their
    # own kinds.  NULL probe → NULL.  A non-literal probe falls back to
    # the typed-array parse (same behavior as before round 10).
    probe = args[1]
    kind = None
    if len(probe) == 1:
        t = probe[0]
        if t.is_kw("NULL"):
            return tokenize("CAST(NULL AS BOOLEAN)")
        if t.is_kw("TRUE", "FALSE"):
            kind = "b"
        elif t.kind == "number":
            kind = "d" if any(c in t.text for c in ".eE") else "l"
        elif t.kind == "string":
            kind = "s"
    elif len(probe) == 2 and probe[0].text in ("-", "+")             and probe[1].kind == "number":
        kind = "d" if any(c in probe[1].text for c in ".eE") else "l"
    if kind is not None:
        arr = args[0]
        # a JSON literal reaches here as to_json(try_parse_json('…'));
        # Spark's variant canonicalizer erases the int/float token
        # distinction (1.0 → 1) the typed matching depends on — feed
        # the raw literal text to the kernel instead
        if (
            len(arr) >= 7 and arr[0].kind == "ident"
            and arr[0].text.lower() == "to_json"
            and arr[2].kind == "ident"
            and arr[2].text.lower() == "try_parse_json"
            and arr[4].kind == "string"
            and arr[5].text == ")" and arr[6].text == ")"
            and len(arr) == 7
        ):
            arr = [arr[4]]
        return _call(
            "presto_json_array_contains", arr,
            [string_literal(kind)],
            _template("CAST(__V__ AS STRING)", v=probe),
        )
    if len(probe) == 1 and probe[0].kind == "string":
        elem_type = "array<string>"
    elif probe and probe[0].is_kw("TRUE", "FALSE"):
        elem_type = "array<boolean>"
    else:
        elem_type = "array<double>"
    arr = _call("from_json", args[0], [string_literal(elem_type)])
    cmp = [ident("__jx"), op("->"), ident("__jx"), op("=")] + (
        [ident("CAST"), op("(")] + list(probe) + [ident("AS"), ident("DOUBLE"), op(")")]
        if elem_type == "array<double>" else list(probe)
    )
    return _call("exists", arr, cmp)


def _parse_duration(args: Args) -> list[Tok]:
    # io.airlift.Duration grammar → interval day to second
    rx = string_literal(r"^\s*([0-9]*\.?[0-9]+)\s*([a-z]+)\s*$")
    v = (
        [ident("CAST"), op("(")]
        + _call("regexp_extract", args[0], [rx], [Tok("number", "1")])
        + [ident("AS"), ident("DOUBLE"), op(")")]
    )
    unit = _call("regexp_extract", args[0], [rx], [Tok("number", "2")])
    case: list[Tok] = [ident("CASE")]
    for u, mult in _DURATION_MS_SQL:
        case += [ident("WHEN")] + unit + [op("="), string_literal(u), ident("THEN")]
        case += _paren(v) + [op("*"), Tok("number", mult)]
    case.append(ident("END"))
    ms = _paren(case)
    return _call(
        "make_dt_interval",
        [Tok("number", "0")], [Tok("number", "0")], [Tok("number", "0")],
        ms + [op("/"), Tok("number", "1000.0")],
    )


def _cosine_similarity(args: Args) -> list[Tok]:
    # sparse-map cosine (MathFunctions.java cosineSimilarity)
    a, b = args
    zero = [ident("CAST"), op("(")] + [Tok("number", "0")] + [ident("AS"), ident("DOUBLE"), op(")")]

    def norm(m: Args) -> list[Tok]:
        lam = [op("("), ident("__na"), op(","), ident("__nv"), op(")"), op("->"),
               ident("__na"), op("+"), ident("__nv"), op("*"), ident("__nv")]
        return _call("sqrt", _call("aggregate", _call("map_values", m), zero, lam))

    dot_lam = (
        [op("("), ident("__da"), op(","), ident("__de"), op(")"), op("->"), ident("__da"), op("+"),
         ident("__de"), op("."), ident("value"), op("*")]
        + _call("coalesce", _call("element_at", b, [ident("__de"), op("."), ident("key")]), zero)
    )
    dot = _call("aggregate", _call("map_entries", a), zero, dot_lam)
    return _paren(dot + [op("/")] + _paren(norm(a) + [op("*")] + norm(b)))


def _array_agg(args: Args) -> list[Tok]:
    """array_agg(x [ORDER BY k [ASC|DESC], …]) — ORDER BY inside an
    aggregation call (SqlBase.g4:287) has no Spark spelling; rewrite to a
    sorted collect (sort keys packed into a struct ahead of the value,
    single shuffle, sorted per group after collection)."""
    toks = list(args[0])
    depth = 0
    ob_idx = None
    for k, t in enumerate(toks):
        if t.text in "([":
            depth += 1
        elif t.text in ")]":
            depth -= 1
        elif depth == 0 and t.is_kw("ORDER") and k + 1 < len(toks) and toks[k + 1].is_kw("BY"):
            ob_idx = k
            break
    if ob_idx is None:
        # Default (non-legacy) array_agg KEEPS null elements
        # (ArrayAggregationFunction.java:120 NULLABLE_BLOCK_INPUT_CHANNEL)
        # and yields NULL — not [] — over zero rows (output:135
        # state.isEmpty → appendNull).  collect_list drops nulls, so the
        # element rides inside a never-null struct.
        wrapped = (
            [ident("named_struct"), op("("), string_literal("v"), op(",")]
            + toks + [op(")")]
        )
        lam = [ident("__aa"), op("->"), ident("__aa"), op("."), ident("v")]
        return _call(
            "transform",
            _call("nullif", _call("collect_list", wrapped), _call("array")),
            lam,
        )
    expr = toks[:ob_idx]
    keys: list[tuple[list[Tok], bool]] = []
    for part in split_top_level(toks[ob_idx + 2:]):
        asc = True
        if part and part[-1].is_kw("DESC"):
            asc, part = False, part[:-1]
        elif part and part[-1].is_kw("ASC"):
            part = part[:-1]
        keys.append((part, asc))
    dirs = {asc for _, asc in keys}
    if len(dirs) != 1:
        raise ValueError("array_agg ORDER BY with mixed ASC/DESC is not supported")
    fields: list[Tok] = []
    for k, (key, _) in enumerate(keys):
        fields += [string_literal(f"k{k}"), op(",")] + list(key) + [op(",")]
    fields += [string_literal("v"), op(",")] + expr
    struct = [ident("named_struct"), op("(")] + fields + [op(")")]
    sorted_ = _call(
        "sort_array", _call("collect_list", struct),
        [ident("true" if dirs == {True} else "false")],
    )
    lam = [ident("__s"), op("->"), ident("__s"), op("."), ident("v")]
    # zero rows → NULL, matching the unordered form (output:135)
    return _call("transform", _call("nullif", sorted_, _call("array")), lam)


def _sorted_collect(x: Args, asc: bool) -> list[Tok]:
    return _call(
        "sort_array", _call("collect_list", x), [ident("true" if asc else "false")]
    )


def _min_max_n(asc: bool):
    # min(x, n) / max(x, n) (MinNAggregationFunction / MaxN…, TypedHeap):
    # the n smallest/largest values as an array.  Zero non-null inputs
    # yield NULL, not [] (AbstractMinMaxNAggregationFunction.output:148
    # appendNull on an empty heap) — hence the nullif guard.
    def rule(args: Args) -> list[Tok]:
        if len(args) == 1:
            return _call("min" if asc else "max", args[0])
        sliced = _call("slice", _sorted_collect(args[0], asc),
                       [Tok("number", "1")], args[1])
        return _call("nullif", sliced, _call("array"))
    return rule


def _min_max_by_n(asc: bool):
    # min_by/max_by(x, y, n) (AbstractMinMaxByNAggregationFunction): x's
    # for the n smallest/largest y's.  Rows with a NULL key never enter
    # the heap (input:169 BLOCK_INPUT_CHANNEL on the key — Spark's
    # sort_array would instead sort them FIRST ascending), and zero
    # retained rows yield NULL, not [].
    def rule(args: Args) -> list[Tok]:
        if len(args) == 2:
            return _call("min_by" if asc else "max_by", args[0], args[1])
        pair = (
            [ident("CASE"), ident("WHEN")] + _paren(args[1])
            + [ident("IS"), ident("NOT"), ident("NULL"), ident("THEN"),
               ident("named_struct"), op("("), string_literal("o"), op(",")]
            + list(args[1]) + [op(","), string_literal("v"), op(",")]
            + list(args[0]) + [op(")"), ident("END")]
        )
        sorted_pairs = _call(
            "sort_array", _call("collect_list", pair), [ident("true" if asc else "false")]
        )
        lam = [ident("__s"), op("->"), ident("__s"), op("."), ident("v")]
        sliced = _call("slice", _call("transform", sorted_pairs, lam),
                       [Tok("number", "1")], args[2])
        return _call("nullif", sliced, _call("array"))
    return rule


def _ngrams(args: Args) -> list[Tok]:
    # ngrams(arr, n) (ArrayNgramsFunction.java): n-element sliding windows;
    # arrays shorter than n yield [arr]
    a, n = args
    count = _paren(
        _call("cardinality", a) + [op("-")] + _paren(list(n) + [op("-"), Tok("number", "1")])
    )
    lam = [ident("__gi"), op("->")] + _call("slice", a, [ident("__gi")], n)
    windows = _call(
        "transform",
        _call("sequence", [Tok("number", "1")],
              _call("greatest", count, [Tok("number", "1")])),
        lam,
    )
    whole = [ident("array"), op("(")] + list(a) + [op(")")]
    return _call(
        "if",
        _call("cardinality", a) + [op(">=")] + list(n),
        windows,
        whole,
    )


def _histogram(args: Args) -> list[Tok]:
    # histogram(x) (histogram/Histogram.java:117): map<value, count> —
    # NULL keys skipped (collect_list already drops them), zero retained
    # values → NULL, not an empty map
    vals = _call("collect_list", args[0])
    keys = _call("nullif", _call("array_distinct", vals), _call("array"))
    count_lam = (
        [ident("__hk"), op("->"), ident("CAST"), op("(")]
        + _call("size", _call("filter", vals,
                              [ident("__hv"), op("->"), ident("__hv"), op("="), ident("__hk")]))
        + [ident("AS"), ident("BIGINT"), op(")")]
    )
    return _call("map_from_arrays", keys, _call("transform", keys, count_lam))


def _multimap_agg(args: Args) -> list[Tok]:
    # multimap_agg(K, V) → map<K, array<V>> (MultimapAggregationFunction
    # .java:115-116): NULL keys skipped (non-nullable key channel), NULL
    # values kept, zero retained pairs → NULL
    entry = (
        [ident("CASE"), ident("WHEN")] + _paren(args[0])
        + [ident("IS"), ident("NOT"), ident("NULL"), ident("THEN"),
           ident("named_struct"), op("("), string_literal("key"), op(",")]
        + list(args[0]) + [op(","), string_literal("value"), op(",")]
        + list(args[1]) + [op(")"), ident("END")]
    )
    entries = _call("collect_list", entry)
    keys = _call(
        "array_distinct",
        _call("transform", entries, [ident("__me"), op("->"), ident("__me"), op("."), ident("key")]),
    )
    vals_lam = (
        [ident("__mk"), op("->")]
        + _call(
            "transform",
            _call("filter", entries,
                  [ident("__mf"), op("->"), ident("__mf"), op("."), ident("key"),
                   op("="), ident("__mk")]),
            [ident("__mv"), op("->"), ident("__mv"), op("."), ident("value")],
        )
    )
    nkeys = _call("nullif", keys, _call("array"))
    return _call("map_from_arrays", nkeys, _call("transform", nkeys, vals_lam))


def _map_union(args: Args) -> list[Tok]:
    # map_union(map) (MapUnionAggregation.java:107-118) — the same
    # KeyValuePairs state as map_agg: the FIRST value wins on duplicate
    # keys (KeyValuePairs.add:113 only inserts when !keyExists), and
    # zero retained pairs yield NULL
    entries = _call("flatten", _call("collect_list", _call("map_entries", args[0])))
    keys = _call(
        "nullif",
        _call(
            "array_distinct",
            _call("transform", entries,
                  [ident("__ue"), op("->"), ident("__ue"), op("."),
                   ident("key")]),
        ),
        _call("array"),
    )
    first_lam = (
        [ident("__uk"), op("->")]
        + _call(
            "element_at",
            _call("filter", entries,
                  [ident("__uf"), op("->"), ident("__uf"), op("."), ident("key"),
                   op("="), ident("__uk")]),
            [Tok("number", "1")],
        )
        + [op("."), ident("value")]
    )
    return _call("map_from_arrays", keys, _call("transform", keys, first_lam))


def _reduce_agg(args: Args) -> list[Tok]:
    # reduce_agg(x, s0, inputFn, combineFn) (ReduceAggregationFunction):
    # fold the collected inputs with the input lambda (combine is the same
    # fold in a single-state execution)
    if len(args) != 4:
        raise ValueError("reduce_agg takes (input, initial, input_fn, combine_fn)")
    arr = _call("collect_list", args[0])
    # Spark's aggregate() requires the accumulator type to equal the zero
    # literal's type exactly (no coercion against the element type), so
    # coerce the zero to the element type arithmetically: adding
    # 0 * first-element is the numeric identity and lets Catalyst find the
    # common type.  Non-numeric folds fail analysis loudly, matching the
    # reference's signature (ReduceAggregationFunction only binds
    # bigint/double states).
    init = (_paren(list(args[1]) + [op("+")]
                   + _call("element_at", arr, [Tok("number", "1")])
                   + [op("*"), Tok("number", "0")]))
    return _call("aggregate", arr, init, args[2])


def _extract_part(field: str, x: Args) -> list[Tok]:
    return [ident("extract"), op("("), ident(field), ident("FROM")] + list(x) + [op(")")]


def _to_milliseconds(args: Args) -> list[Tok]:
    # to_milliseconds(interval day to second) (DateTimeFunctions.java) —
    # widen to the full DAY TO SECOND range first: Spark only extracts
    # fields inside the interval's declared start..end precision
    x = (
        [ident("CAST"), op("(")] + list(args[0])
        + [ident("AS"), ident("INTERVAL"), ident("DAY"), ident("TO"), ident("SECOND"), op(")")]
    )
    total = (
        _extract_part("DAY", x) + [op("*"), Tok("number", "86400000"), op("+")]
        + _extract_part("HOUR", x) + [op("*"), Tok("number", "3600000"), op("+")]
        + _extract_part("MINUTE", x) + [op("*"), Tok("number", "60000"), op("+")]
        + [ident("CAST"), op("(")] + _extract_part("SECOND", x)
        + [op("*"), Tok("number", "1000"), ident("AS"), ident("BIGINT"), op(")")]
    )
    return [ident("CAST"), op("(")] + _paren(total) + [ident("AS"), ident("BIGINT"), op(")")]


def _millisecond(args: Args) -> list[Tok]:
    # millisecond(timestamp) — the fractional-second millis component
    sec_ms = (
        [ident("CAST"), op("(")] + _extract_part("SECOND", args[0])
        + [op("*"), Tok("number", "1000"), ident("AS"), ident("BIGINT"), op(")")]
    )
    return _paren(sec_ms + [op("%"), Tok("number", "1000")])


def _normalize(args: Args) -> list[Tok]:
    # normalize(s[, FORM]) — the form is a bare keyword in the grammar
    # (SqlBase.g4 normalForm); routed to the engine-registered UDF
    form = [string_literal("NFC")]
    if len(args) == 2:
        form = [string_literal(args[1][0].text.upper())]
    return _call("presto_normalize", args[0], form)


def _bing_tile(args: Args) -> list[Tok]:
    # BingTileFunctions.java: bing_tile(quadkey) vs bing_tile(x, y, zoom)
    # — SQL UDFs cannot overload by arity, so the 1-arg form dispatches
    # to the quadkey decoder registered by functions/geo_sql.py
    if len(args) == 1:
        return _call("bing_tile_from_quadkey", args[0])
    return _call("bing_tile", *args)


def _spatial_partitions(args: Args) -> list[Tok]:
    # GeoFunctions.java:1130-1199 — the 3-arg (distance) form has
    # distinct NULL semantics, registered under its own name
    if len(args) == 3:
        return _call("presto_spatial_partitions_dist", *args)
    return _call("spatial_partitions", *args)


def _data_size_for_stats(agg: str):
    # SumDataSizeForStats.java / MaxDataSizeForStats.java — the hidden
    # ANALYZE-support aggregates ("$internal$…", hidden=true): sum/max
    # of Block.getEstimatedDataSizeForStats per value.  Spelled as a
    # plain sum/max over the runtime-typed size scalar
    # (binary_fns.presto_data_size_for_stats), which keeps Spark's
    # partial aggregation.  typeof() feeds the scalar the static type so
    # fixed-width sizes (int 4, bigint 8, …) match the reference.
    def rule(args: Args) -> list[Tok]:
        arg = list(args[0])
        # the engine spells CAST(x AS CHAR(n)) as rpad(substring(…));
        # the reference strips trailing spaces when casting to char and
        # sizes the STRIPPED value (AbstractTestAggregations.java:757),
        # so unwrap the pad for the size estimate
        if arg and arg[0].kind == "ident" and arg[0].text.lower() == "rpad":
            arg = _call("rtrim", arg)
        return _call(agg, _call("presto_data_size_for_stats", arg,
                                _call("typeof", arg)))
    return rule


def _geometry_union_agg(args: Args) -> list[Tok]:
    # aggregation/GeometryUnionAgg.java — union is commutative and
    # associative, so collect_list + the n-ary union scalar is exact.
    # This single-array spelling is the FALLBACK: qualifying aggregate
    # blocks were already respelled as a bounded-state two-phase
    # aggregation by translate._pass_two_phase_geo_agg before function
    # rewriting; only blocks that pass (DISTINCT/HAVING/windows/
    # non-decomposable sibling aggregates…) reach here.
    return _call("geometry_union", _call("collect_list", args[0]))


def _convex_hull_agg(args: Args) -> list[Tok]:
    # aggregation/ConvexHullAggregation.java — hull of the pooled
    # vertex set; fallback spelling, see _geometry_union_agg
    return _call("presto_convex_hull_of_collection",
                 _call("collect_list", args[0]))


def _spatial_partitioning(args: Args) -> list[Tok]:
    # SpatialPartitioningAggregateFunction.java — KdbTree build over
    # the collected sample; partition count defaults to 100
    count = args[1] if len(args) == 2 else [Tok("number", "100")]
    return _call("presto_spatial_partitioning_build",
                 _call("collect_list", args[0]), count)


def _width_bucket(args: Args) -> list[Tok]:
    # width_bucket(x, bins_array) 2-arg form: count of sorted bin bounds
    # ≤ x (MathFunctions.java binary search)
    if len(args) != 2:
        return _call("width_bucket", *args)
    lam = [ident("__wb"), op("->")] + _paren(list(args[0])) + [op(">="), ident("__wb")]
    return (
        [ident("CAST"), op("(")]
        + _call("size", _call("filter", args[1], lam))
        + [ident("AS"), ident("BIGINT"), op(")")]
    )


def _url_extract_port(args: Args) -> list[Tok]:
    # Spark parse_url has no PORT part; pull it off AUTHORITY.  Presto
    # returns NULL when no explicit port (UrlFunctions.java).
    auth = _call("parse_url", args[0], [string_literal("AUTHORITY")])
    port = _call(
        "regexp_extract", auth, [string_literal(":([0-9]+)$")], [Tok("number", "1")]
    )
    nn = _call("nullif", port, [string_literal("")])
    return _paren(
        [ident("CAST"), op("(")] + nn + [ident("AS"), ident("BIGINT"), op(")")]
    )


# Character.isWhitespace's exact set (StringFunctions.java trim family
# delegates to it): controls \t \n \x0B \f \r \x1C-\x1F plus the
# Unicode space/line/paragraph separators EXCEPT the non-breaking ones
# (U+00A0, U+2007, U+202F are NOT whitespace to Java)
_JAVA_WS = '\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2008\u2009\u200a\u2028\u2029\u205f\u3000'


def _trim_rule(side: str):
    # trim/ltrim/rtrim(s): the reference strips every
    # Character.isWhitespace codepoint; Spark's builtins strip only
    # ' '.  The 2-arg forms take an explicit character set — Spark's
    # 2-arg ltrim/rtrim spell (trimStr, str), reversed from Presto.
    # Also unpacks the SQL-standard ``trim([BOTH|LEADING|TRAILING]
    # [chars] FROM s)`` spelling (SqlBase.g4 trim production), which
    # arrives as a single comma-free argument.
    pats = {"l": f"^[{_JAVA_WS}]+",
            "r": f"[{_JAVA_WS}]+$",
            "b": f"^[{_JAVA_WS}]+|[{_JAVA_WS}]+$"}

    def rule(args: Args) -> list[Tok]:
        s = side
        if len(args) == 1:
            seg = list(args[0])
            if seg and seg[0].is_kw("BOTH"):
                s, seg = "b", seg[1:]
            elif seg and seg[0].is_kw("LEADING"):
                s, seg = "l", seg[1:]
            elif seg and seg[0].is_kw("TRAILING"):
                s, seg = "r", seg[1:]
            fi = next((k for k, t in enumerate(seg) if t.is_kw("FROM")), None)
            if fi is not None:
                chars = seg[:fi]
                src = seg[fi + 1:]
                args = [src, chars] if chars else [src]
            else:
                args = [seg]
        if len(args) == 2:
            if s == "b":
                return _call("btrim", args[0], args[1])
            name = "ltrim" if s == "l" else "rtrim"
            return _call(name, args[1], args[0])
        return _call("regexp_replace", args[0], [string_literal(pats[s])],
                     [string_literal("")])
    return rule


def _chr(args: Args) -> list[Tok]:
    # chr(n) is the Unicode CODEPOINT (StringFunctions.java chr →
    # codePointChar); Spark's char() wraps at 256
    return _template(
        "decode(to_binary(lpad(hex(__N__), 8, '0'), 'hex'), 'UTF-32')",
        n=args[0])


def _replace(args: Args) -> list[Tok]:
    # replace with an EMPTY search string inserts the replacement
    # around every character (StringFunctions.java replace → empty
    # pattern matches at each boundary); Spark returns the input
    if len(args) == 2:
        args = [*args, [string_literal("")]]
    return _template(
        "(CASE WHEN __P__ = '' AND __S__ = '' THEN __R__ "
        "WHEN __P__ = '' THEN __R__ || array_join(transform("
        "split(__S__, ''), __rc -> __rc || __R__), '') "
        "ELSE replace(__S__, __P__, __R__) END)",
        s=args[0], p=args[1], r=args[2])


def _substr_rule(args: Args) -> list[Tok]:
    # substr(s, p[, n]): the reference returns '' for p = 0 and for a
    # negative p beyond the string's start (SliceUtf8-based
    # StringFunctions.substr); Spark clamps both to position 1.
    # Also unpacks the ANSI ``substring(x FROM p [FOR n])`` spelling.
    if len(args) == 1:
        seg = args[0]
        fi = next((k for k, t in enumerate(seg) if t.is_kw("FROM")), None)
        if fi is None:
            return _call("substr", *args)
        rest = seg[fi + 1:]
        ki = next((k for k, t in enumerate(rest) if t.is_kw("FOR")), None)
        if ki is None:
            args = [seg[:fi], rest]
        else:
            args = [seg[:fi], rest[:ki], rest[ki + 1:]]
    call = _call("substr", *args)
    # a positive literal start needs no guard (also keeps the internal
    # VARCHAR(n)-cast truncation spelling a plain substring)
    p = args[1]
    if len(p) == 1 and p[0].kind == "number" and "." not in p[0].text \
            and int(p[0].text) > 0:
        return call
    return _template(
        "(CASE WHEN __P__ = 0 OR __P__ < -length(__S__) THEN '' "
        "ELSE __C__ END)",
        s=args[0], p=args[1], c=call)


def _split_part(args: Args) -> list[Tok]:
    # split_part(s, d, part) (StringFunctions.java splitPart): the
    # delimiter is a LITERAL, an empty delimiter splits per character,
    # and a part index past the count yields NULL — Spark's builtin
    # regex-free split_part returns '' past the end instead
    s, d, p = args
    return _template(
        "(CASE WHEN __P__ = 0 THEN '' "
        "WHEN __D__ = '' THEN "
        "(CASE WHEN __P__ <= length(__S__) "
        "THEN substr(__S__, CAST(__P__ AS INT), 1) END) "
        "WHEN __P__ > (length(__S__) - length(replace(__S__, __D__, ''))) "
        "DIV length(__D__) + 1 THEN NULL "
        "ELSE split_part(__S__, __D__, CAST(__P__ AS INT)) END)",
        s=s, d=d, p=p)


def _quote_regex(arg: list[Tok]) -> list[Tok]:
    """Literal delimiter → regex-quoted literal for Spark's split()."""
    if len(arg) == 1 and arg[0].kind == "string":
        return [string_literal(re.escape(string_value(arg[0])))]
    return arg


def _split_to_multimap(args: Args) -> list[Tok]:
    # split_to_multimap(s, entryDelim, kvDelim) (StringFunctions.java):
    # map<varchar, array<varchar>> — each entry splits at the FIRST
    # kvDelim, values grouped per key in entry order; '' → {}
    s, ed, kd = args
    entry = (
        "named_struct('key', substring_index(__sme, __KD__, 1), "
        "'value', substr(__sme, length(substring_index(__sme, __KD__, 1))"
        " + length(__KD__) + 1))"
    )
    return _template(
        "(CASE WHEN __S__ = '' THEN CAST(map() AS MAP<STRING, "
        "ARRAY<STRING>>) ELSE map_from_arrays("
        f"array_distinct(transform(split(__S__, __ED__), __sme -> "
        f"{entry}.key)), "
        f"transform(array_distinct(transform(split(__S__, __ED__), "
        f"__sme -> {entry}.key)), __smk -> "
        f"transform(filter(transform(split(__S__, __ED__), __sme -> "
        f"{entry}), __smf -> __smf.key = __smk), __smv -> __smv.value))) "
        "END)",
        s=s, ed=_quote_regex(ed), kd=kd)


def _split_to_map(args: Args) -> list[Tok]:
    # SPLIT_TO_MAP('', …) → {} (the reference finds no entries);
    # Spark's str_to_map('') yields {'': NULL}
    return _template(
        "(CASE WHEN __S__ = '' THEN map() "
        "ELSE str_to_map(__S__, __ED__, __KD__) END)",
        s=args[0], ed=args[1], kd=args[2])


def _split(args: Args) -> list[Tok]:
    # Presto split() delimiter is a literal; Spark's is a regex → quote it.
    if len(args) >= 2 and len(args[1]) == 1 and args[1][0].kind == "string":
        delim = string_value(args[1][0])
        args = [args[0], [string_literal(re.escape(delim))], *args[2:]]
    return _call("split", *args)


def _regexp_extract(args: Args) -> list[Tok]:
    # Presto default group = 0 (whole match); Spark default = 1.  A
    # NON-MATCHING pattern yields NULL (RegexpFunctions.regexpExtract),
    # where Spark returns '' — guard with regexp_like.  (A matching
    # pattern whose GROUP did not participate still returns '' — a
    # documented residual; group participation is invisible to SQL.)
    if len(args) == 2:
        args = [*args, [Tok("number", "0")]]
    return _template(
        "(CASE WHEN regexp_like(__S__, __P__) "
        "THEN regexp_extract(__S__, __P__, __G__) END)",
        s=args[0], p=args[1], g=args[2])


def _named_group_indexes(pattern: str) -> dict[str, int]:
    """Capture-group name → 1-based index for a Java/Joni pattern."""
    out: dict[str, int] = {}
    idx = 0
    i = 0
    n = len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if c == "[" and not in_class:
            in_class = True
        elif c == "]" and in_class:
            in_class = False
        elif c == "(" and not in_class:
            if pattern[i + 1:i + 2] != "?":
                idx += 1
            else:
                m = re.match(r"\(\?<([A-Za-z][A-Za-z0-9]*)>",
                             pattern[i:])
                if m:
                    idx += 1
                    out[m.group(1)] = idx
        i += 1
    return out


def _regexp_replace(args: Args) -> list[Tok]:
    # the 2-argument form deletes every match (RegexpFunctions.java
    # regexpReplace(x, p) → replace with ''); Spark requires 3 args
    if len(args) == 2:
        args = [*args, [string_literal("")]]
    s, p, r = args[0], args[1], args[2]
    arrow = next((k for k, t in enumerate(r) if t.text == "->"), None)
    if arrow is not None:
        # lambda replacement (JoniRegexpFunctions regexpReplace(x, p,
        # function)): the runtime splitter yields per-match group
        # arrays; the lambda is applied via transform (a Catalyst
        # expression — only the splitter is Python) and the pieces
        # reassemble with ||, which propagates a NULL replacement to a
        # NULL result exactly like the reference
        head = [t for t in r[:arrow] if t.text not in ("(", ")")]
        var = head[0].text if head else "__rv"
        return _template(
            "(CASE WHEN __S__ IS NULL OR __P__ IS NULL "
            "THEN CAST(NULL AS STRING) ELSE "
            "element_at(transform(array(presto_regexp_segments(__S__, __P__)), "
            "__rm -> element_at(transform(array(named_struct("
            "'segs', __rm.segs, "
            f"'reps', transform(__rm.grps, {var} -> __B__))), "
            "__rz -> CASE WHEN size(__rz.reps) = 0 "
            "THEN element_at(__rz.segs, 1) "
            "ELSE aggregate(sequence(1, size(__rz.reps)), "
            "CAST(element_at(__rz.segs, 1) AS STRING), "
            "(__racc, __ri) -> __racc || element_at(__rz.reps, __ri) "
            "|| element_at(__rz.segs, __ri + 1)) END), 1)), 1) END)",
            s=s, p=p, b=list(r[arrow + 1:]))
    if (
        len(p) == 1 and p[0].kind == "string"
        and len(r) == 1 and r[0].kind == "string"
        and "${" in string_value(r[0])
    ):
        # ${name} group references: Spark's replacement layer only
        # resolves $N — map names to indexes from the literal pattern
        names = _named_group_indexes(string_value(p[0]))
        txt = string_value(r[0])
        for name, gi in names.items():
            txt = txt.replace("${" + name + "}", f"${gi}")
        r = [string_literal(txt)]
    return _call("regexp_replace", s, p, r)


def _regexp_extract_all(args: Args) -> list[Tok]:
    if len(args) == 2:
        args = [*args, [Tok("number", "0")]]
    return _call("regexp_extract_all", *args)


_URL_PART = {
    "url_extract_host": "HOST",
    "url_extract_path": "PATH",
    "url_extract_protocol": "PROTOCOL",
    "url_extract_query": "QUERY",
    "url_extract_fragment": "REF",
}


def _url_extract(part: str):
    def rule(args: Args) -> list[Tok]:
        return _call("parse_url", args[0], [string_literal(part)])
    return rule


def _numeric_histogram(args: Args) -> list[Tok]:
    """numeric_histogram(buckets, x[, w]) → map<double,double>.

    Deterministic equi-width twin of the reference's adaptive sketch
    (NumericHistogram.java — engine-defined boundaries, so an exact
    reimplementation has no spec to match); mirrors the Column-API
    builder in functions/agg_fns.py.  Identical collect_list aggregates
    are deduplicated by Catalyst, so the repeated spelling costs one
    aggregation.
    """
    if len(args) not in (2, 3):
        raise ValueError("numeric_histogram takes 2-3 arguments")
    from facebook_presto_spark.sqlfront.tokens import render

    b = f"CAST(({render(args[0])}) AS INT)"
    x = render(args[1])
    wt = render(args[2]) if len(args) == 3 else "1.0"
    pairs = (
        f"collect_list(named_struct('v', CAST(({x}) AS DOUBLE), "
        f"'w', CAST(({wt}) AS DOUBLE)))"
    )
    lo = f"array_min(transform({pairs}, __p -> __p.v))"
    hi = f"array_max(transform({pairs}, __p -> __p.v))"
    width = (
        f"(CASE WHEN {hi} = {lo} THEN CAST(1.0 AS DOUBLE) "
        f"ELSE ({hi} - {lo}) / CAST({b} AS DOUBLE) END)"
    )
    bucket = f"least({b} - 1, CAST(floor((__p.v - {lo}) / {width}) AS INT))"
    total = f"aggregate({pairs}, CAST(0.0 AS DOUBLE), (__a, __p) -> __a + __p.w)"
    sql = f"""
    CASE WHEN size({pairs}) = 0 THEN NULL
         WHEN {hi} = {lo} THEN map({lo}, {total})
         ELSE map_from_entries(filter(transform(
                sequence(0, {b} - 1),
                __i -> struct(
                  {lo} + (CAST(__i AS DOUBLE) + 0.5) * {width},
                  aggregate(filter({pairs}, __p -> {bucket} = __i),
                            CAST(0.0 AS DOUBLE), (__a, __p) -> __a + __p.w))),
              __e -> __e.col2 > 0))
    END"""
    return [op("(")] + tokenize(sql) + [op(")")]


def _contains(args: Args) -> list[Tok]:
    # array contains(arr, x); Spark's `contains` is string-only.
    # A ROW(…) needle goes through the equality lambda instead:
    # array_contains matches struct field *names* (row elements from
    # array_agg(ROW(a, b)) are named a,b; the literal ROW is col1,col2),
    # while `=` compares structs positionally like the reference's row
    # equality operator (RowEqualOperator).
    if (
        len(args) == 2 and len(args[1]) >= 3
        and args[1][0].kind == "ident"
        and args[1][0].upper in ("ROW", "STRUCT")  # pre/post rename
        and args[1][1].text == "("
    ):
        return (
            [ident("exists"), op("(")] + args[0]
            + [op(","), ident("__e"), op("->"), ident("__e"), op("=")]
            + args[1] + [op(")")]
        )
    if len(args) == 2 and len(args[1]) == 1 and args[1][0].is_kw("NULL"):
        # contains(x, NULL) → NULL (ArraysOverlapFunction-style
        # three-valued logic; Spark rejects the untyped NULL argument)
        return tokenize("CAST(NULL AS BOOLEAN)")
    return _call("array_contains", *args)


def _map_agg(args: Args) -> list[Tok]:
    # map_agg(k, v) (MapAggregationFunction.java:109-110 +
    # KeyValuePairs.add:113): NULL keys are skipped (non-nullable key
    # channel), duplicate keys keep the FIRST value seen, NULL values
    # are kept, and zero retained pairs yield NULL — Spark's
    # map_from_entries instead errors on both NULL and duplicate keys.
    entry = (
        [ident("CASE"), ident("WHEN")] + _paren(args[0])
        + [ident("IS"), ident("NOT"), ident("NULL"), ident("THEN"),
           ident("named_struct"), op("("), string_literal("key"), op(",")]
        + list(args[0]) + [op(","), string_literal("value"), op(",")]
        + list(args[1]) + [op(")"), ident("END")]
    )
    entries = _call("collect_list", entry)  # drops the NULL-key CASE rows
    keys = _call(
        "array_distinct",
        _call("transform", entries,
              [ident("__mae"), op("->"), ident("__mae"), op("."),
               ident("key")]),
    )
    first_lam = (
        [ident("__mak"), op("->")]
        + _call(
            "element_at",
            _call("filter", entries,
                  [ident("__maf"), op("->"), ident("__maf"), op("."),
                   ident("key"), op("="), ident("__mak")]),
            [Tok("number", "1")],
        )
        + [op("."), ident("value")]
    )
    nkeys = _call("nullif", keys, _call("array"))
    return _call("map_from_arrays", nkeys, _call("transform", nkeys, first_lam))


def _map_ctor(args: Args) -> list[Tok]:
    # Presto map() / map(key_array, value_array) constructor (MapConstructor);
    # Spark's map() takes interleaved k,v — the two-array form is
    # map_from_arrays. MAP(K,V) *types* are handled by translate's cast pass.
    if len(args) == 2:
        return _call("map_from_arrays", *args)
    if not args:
        return _call("map")
    return _call("map", *args)


def _features(args: Args) -> list[Tok]:
    # features(x0, x1, ...) → map<bigint,double> feature vector
    # (MLFeaturesFunctions.java)
    keys = [
        _call("cast", [Tok("number", str(i))] + [ident("AS"), ident("bigint")])
        for i in range(len(args))
    ]
    vals = [
        _call("cast", a + [ident("AS"), ident("double")]) for a in args
    ]
    return _call(
        "map_from_arrays", _call("array", *keys), _call("array", *vals)
    )


def _learn_agg(udf_name: str, cast_label: bool = False):
    # learn_classifier(l, f) / learn_regressor(l, f) and the
    # learn_libsvm_* 3-arg forms (Learn*Aggregation.java,
    # LibSvmUtils.java): the reference trains single-node over the
    # collected features (decomposable = false), so the SQL spelling is
    # collect_list + the registered training UDF; the optional libsvm
    # parameter string rides along via any_value.
    def rule(args: Args) -> list[Tok]:
        label = _call("cast", args[0] + [ident("AS"), ident("double")]) \
            if cast_label else args[0]
        struct = _call(
            "named_struct",
            [Tok("string", "'l'")], label,
            [Tok("string", "'f'")], args[1],
        )
        params = args[2] if len(args) > 2 else [Tok("string", "''")]
        return _call(
            udf_name, _call("collect_list", struct), _call("any_value", params)
        )

    return rule


def _checksum(args: Args) -> list[Tok]:
    # order-independent checksum (ChecksumAggregationFunction.java):
    # sum of per-row 64-bit hashes commutes — same verifier trick.
    return _call("sum", _call("xxhash64", _call("to_json", _call("struct", args[0]))))


def _truncate(args: Args) -> list[Tok]:
    # truncate(x) / truncate(x, n): round toward zero (MathFunctions.java)
    n = args[1] if len(args) == 2 else [Tok("number", "0")]
    scale = _call("power", [Tok("number", "10")], n)
    scaled = _paren(args[0] + [op("*")] + scale)
    floored = _call("floor", _call("abs", scaled))
    signed = _paren(_call("sign", args[0]) + [op("*")] + floored)
    return _paren(signed + [op("/")] + scale)


def _infinity(args: Args) -> list[Tok]:
    return _paren([ident("CAST"), op("("), string_literal("Infinity"),
                   ident("AS"), ident("DOUBLE"), op(")")])


def _nan(args: Args) -> list[Tok]:
    return _paren([ident("CAST"), op("("), string_literal("NaN"),
                   ident("AS"), ident("DOUBLE"), op(")")])


def _is_finite(args: Args) -> list[Tok]:
    # NULL argument → NULL (the reference's scalar null convention);
    # Spark's isnan/comparisons would quietly produce FALSE
    x = args[0]
    not_nan = [ident("NOT")] + _call("isnan", x)
    # any finite double compares < +inf; NaN already excluded above
    bounded = _call("abs", x) + [op("<")] + _infinity([])
    return _template(
        "(CASE WHEN __A__ IS NULL THEN NULL ELSE __C__ END)",
        a=x, c=_paren(not_nan + [ident("AND")] + bounded))


def _is_nan(args: Args) -> list[Tok]:
    # is_nan(NULL) → NULL (TestMathFunctions.java); Spark isnan → false
    return _template(
        "(CASE WHEN __A__ IS NULL THEN NULL ELSE isnan(__A__) END)",
        a=args[0])


def _is_infinite(args: Args) -> list[Tok]:
    # MathFunctions.isInfinite; NULL → NULL
    return _template(
        "(CASE WHEN __A__ IS NULL THEN NULL "
        "ELSE abs(CAST(__A__ AS DOUBLE)) = CAST('Infinity' AS DOUBLE) END)",
        a=args[0])


def _to_base(args: Args) -> list[Tok]:
    # sign-magnitude like the reference (MathFunctions.toBase via
    # Long.toString(long, radix): to_base(-255, 16) = '-ff'); Spark's
    # conv() renders negatives as unsigned two's complement
    return _template(
        "(CASE WHEN __X__ < 0 THEN '-' || lower(conv(-__X__, 10, __B__)) "
        "ELSE lower(conv(__X__, 10, __B__)) END)",
        x=args[0], b=args[1])


def _from_base(args: Args) -> list[Tok]:
    # sign-magnitude inverse (Long.parseLong(s, radix) accepts a leading
    # '-'); the unary negate of the wrapped magnitude reproduces
    # Long.MIN_VALUE exactly (two's complement) — except that the
    # magnitude 2^63 itself overflows the intermediate BIGINT cast, so
    # parseLong's one asymmetric accepted value is pinned explicitly
    return _template(
        "(CASE WHEN substr(__S__, 1, 1) = '-' "
        "THEN (CASE WHEN conv(substr(__S__, 2), __B__, 10) = "
        "'9223372036854775808' THEN -9223372036854775807 - 1 "
        "ELSE -CAST(conv(substr(__S__, 2), __B__, 10) AS BIGINT) END) "
        "ELSE CAST(conv(__S__, __B__, 10) AS BIGINT) END)",
        s=args[0], b=args[1])


def _random(args: Args) -> list[Tok]:
    # random() → rand(); random(n) (MathFunctions.java) is a BOUNDED
    # integer in [0, n) — NOT a seeded generator (Spark's rand(seed)
    # would misread the argument as a seed)
    if not any(args):
        return _call("rand")
    return _template(
        "CAST(floor(rand() * __N__) AS BIGINT)", n=args[0])


def _is_json_scalar(args: Args) -> list[Tok]:
    # JsonFunctions.isJsonScalar: true for a JSON number/string/bool/
    # null, false for arrays and objects (JSON is carried as text here,
    # so the first non-blank character decides)
    return _template(
        "(CASE WHEN __J__ IS NULL THEN NULL "
        "ELSE NOT (startswith(ltrim(__J__), '[') "
        "OR startswith(ltrim(__J__), '{')) END)",
        j=args[0])


def _wilson(sign: str):
    # MathFunctions.java wilsonIntervalLower/Upper: the closed-form
    # Wilson score bound over (successes, trials, z) in doubles
    def rule(args: Args) -> list[Tok]:
        return _template(
            "((CAST(__S__ AS DOUBLE) / CAST(__T__ AS DOUBLE) "
            " + __Z__ * __Z__ / (2 * CAST(__T__ AS DOUBLE)) "
            f" {sign} __Z__ * sqrt((CAST(__S__ AS DOUBLE) / CAST(__T__ AS DOUBLE) "
            "   * (1 - CAST(__S__ AS DOUBLE) / CAST(__T__ AS DOUBLE)) "
            "   + __Z__ * __Z__ / (4 * CAST(__T__ AS DOUBLE))) "
            "   / CAST(__T__ AS DOUBLE))) "
            " / (1 + __Z__ * __Z__ / CAST(__T__ AS DOUBLE)))",
            s=args[0], t=args[1], z=args[2])
    return rule


def _multimap_from_entries(args: Args) -> list[Tok]:
    # MultimapFromEntriesFunction.java: group entry rows by key keeping
    # encounter order of both keys and values; NULL input → NULL,
    # empty → empty map.  Pure higher-order composition (candidate-
    # sized inputs; no shuffle).  Entry field names follow the operand:
    # tuple literals are col1/col2, unnamed-ROW casts field0/field1,
    # named-ROW casts their declared names.
    a = args[0]
    if len(a) == 1 and a[0].is_kw("NULL"):
        return tokenize("CAST(NULL AS MAP<STRING, STRING>)")
    if len(a) == 3 and ((a[0].is_kw("ARRAY") and a[1].text == "[")
                        or (a[0].kind == "ident"
                            and a[0].text.lower() == "array"
                            and a[1].text == "(")):
        return _call("map")
    kf, vf = "col1", "col2"
    txt = " ".join(t.text for t in a)
    m = re.search(r"STRUCT\s*<\s*(\w+)\s*:[^,]*,\s*(\w+)\s*:", txt)
    if m:
        kf, vf = m.group(1), m.group(2)
    return _template(
        "(CASE WHEN __A__ IS NULL THEN NULL "
        "WHEN size(__A__) = 0 THEN map() ELSE "
        "map_from_arrays("
        f"  array_distinct(transform(__A__, __mfe -> __mfe.{kf})), "
        f"  transform(array_distinct(transform(__A__, __mfe -> __mfe.{kf})), "
        f"    __mfk -> transform(filter(__A__, __mfe -> __mfe.{kf} <=> __mfk), "
        f"             __mfe -> __mfe.{vf}))) END)",
        a=args[0])


def _map_from_entries(args: Args) -> list[Tok]:
    # map_from_entries(NULL) → NULL and map_from_entries(ARRAY[]) → {}
    # (MapFromEntriesFunction.java) — Spark cannot type either literal
    if len(args) == 1 and len(args[0]) == 1 and args[0][0].is_kw("NULL"):
        return tokenize("CAST(NULL AS MAP<STRING, STRING>)")
    if len(args) == 1 and len(args[0]) == 3 and (
        (args[0][0].is_kw("ARRAY") and args[0][1].text == "[")
        or (args[0][0].kind == "ident" and args[0][0].text.lower() == "array"
            and args[0][1].text == "(")
    ):
        return _call("map")
    return _call("map_from_entries", *args)


def _array_except_rule(args: Args) -> list[Tok]:
    # array_except with a literal NULL argument returns NULL typed from
    # the OTHER operand (ArrayExceptFunction RETURN_NULL_ON_NULL);
    # Spark cannot resolve the untyped literal
    def is_null(a: list[Tok]) -> bool:
        return len(a) == 1 and a[0].is_kw("NULL")
    if len(args) == 2 and (is_null(args[0]) or is_null(args[1])):
        other = args[1] if is_null(args[0]) else args[0]
        if is_null(other):
            return tokenize("CAST(NULL AS ARRAY<STRING>)")
        return _template("IF(true, NULL, array_except(__O__, __O__))",
                         o=other)
    return _call("array_except", *args)


def _normal_cdf(args: Args) -> list[Tok]:
    # normal_cdf(m, sd, x) → NaN when any input is NaN
    # (MathFunctions.java delegates to doubles end-to-end); the Arrow
    # pandas-UDF return path erases NaN to NULL (pyarrow from_pandas
    # NaN-as-null), so the NaN case short-circuits SQL-side
    if len(args) != 3:
        return _call("normal_cdf", *args)
    return _template(
        "(CASE WHEN isnan(CAST(__M__ AS DOUBLE)) "
        "OR isnan(CAST(__S__ AS DOUBLE)) "
        "OR isnan(CAST(__X__ AS DOUBLE)) THEN CAST('NaN' AS DOUBLE) "
        "ELSE normal_cdf(__M__, __S__, __X__) END)",
        m=args[0], s=args[1], x=args[2])


def _regexp_split_rule(args: Args) -> list[Tok]:
    # an EMPTY pattern matches at every boundary, producing leading and
    # trailing '' elements (JoniRegexpFunctions.regexpSplit); Spark's
    # split drops them for the '' pattern specifically
    return _template(
        "(CASE WHEN __P__ = '' "
        "THEN concat(array(''), split(__S__, ''), array('')) "
        "ELSE split(__S__, __P__, -1) END)",
        s=args[0], p=args[1])


def _reduce_rule(args: Args) -> list[Tok]:
    # reduce(arr, init, merge, finish) → aggregate(...).  Spark pins
    # the accumulator type to the init literal's type; the reference
    # coerces the state to the supertype of init and the lambda result
    # (TestArrayReduceFunction — bigint elements with an int 0 init).
    # Widen bare integer literals to BIGINT and bare decimal literals
    # to DOUBLE so the common spellings resolve.
    if len(args) == 4:
        init = args[1]
        neg = len(init) == 2 and init[0].text == "-" \
            and init[1].kind == "number"
        lit = init[-1] if (len(init) == 1 or neg) else None
        if lit is not None and lit.kind == "number":
            t = "DOUBLE" if ("." in lit.text or "e" in lit.text.lower()) \
                else "BIGINT"
            args = [args[0],
                    [ident("CAST"), op("(")] + init
                    + [ident("AS"), ident(t), op(")")],
                    args[2], args[3]]
    return _call("aggregate", *args)


def _url_extract_parameter(args: Args) -> list[Tok]:
    # UrlFunctions.urlExtractParameter: split the query on '&', take
    # the FIRST pair whose key matches; a key present without '=' (or
    # with nothing after it) yields '' — Spark's parse_url(…, key)
    # regex requires '=' and returns the LAST match
    return _template(
        "(CASE WHEN parse_url(__U__, 'QUERY') IS NULL OR __K__ IS NULL "
        "THEN NULL ELSE "
        "(CASE WHEN get(filter(split(parse_url(__U__, 'QUERY'), '&'), "
        "  __up -> __up = __K__ OR startswith(__up, concat(__K__, '='))), 0) "
        "  IS NULL THEN NULL "
        "WHEN get(filter(split(parse_url(__U__, 'QUERY'), '&'), "
        "  __up -> __up = __K__ OR startswith(__up, concat(__K__, '='))), 0) "
        "  = __K__ THEN '' "
        "ELSE substring(get(filter(split(parse_url(__U__, 'QUERY'), '&'), "
        "  __up -> __up = __K__ OR startswith(__up, concat(__K__, '='))), 0), "
        "  length(__K__) + 2) END) END)",
        u=args[0], k=args[1])


def _zero_lambda_body(a: list[Tok]) -> list[Tok] | None:
    """Body of a zero-argument lambda ``() -> body`` (else None)."""
    seg = list(a)
    while len(seg) >= 2 and seg[0].text == "(" and \
            find_matching_paren(seg, 0) == len(seg) - 1:
        inner = seg[1:-1]
        if len(inner) >= 3 and inner[0].text == "(" \
                and inner[1].text == ")" and inner[2].text == "->":
            seg = inner
            break
        seg = inner
    if len(seg) >= 3 and seg[0].text == "(" and seg[1].text == ")" \
            and seg[2].text == "->":
        return seg[3:]
    return None


def _internal_try(args: Args) -> list[Tok]:
    # "$internal$try"(() -> expr) (TryFunction.java desugared form):
    # the zero-arg lambda wraps the guarded expression
    if len(args) == 1:
        body = _zero_lambda_body(args[0])
        if body is not None:
            return _try([body])
    return _try(args)


def _invoke(args: Args) -> list[Tok]:
    # invoke(f) applies a zero-arg lambda (InvokeFunction.java)
    if len(args) == 1:
        body = _zero_lambda_body(args[0])
        if body is None:
            seg = list(args[0])
            if len(seg) >= 2 and seg[0].text == "(" \
                    and find_matching_paren(seg, 0) == len(seg) - 1 \
                    and any(t.text == "->" for t in seg):
                body = None  # parenthesized n-ary lambda: not invokable
        if body is not None:
            return _paren(body)
    raise ValueError("invoke() takes a zero-argument lambda")


def _internal_bind(args: Args) -> list[Tok]:
    # "$internal$bind"(c1, …, ck, (p1, …, pm) -> body)
    # (BindFunction.java): curries the first k parameters — emit the
    # residual lambda with the bound parameters substituted
    if len(args) < 2:
        raise ValueError("$internal$bind takes constants and a lambda")
    *consts, lam = args
    lam = list(lam)
    if len(lam) >= 2 and lam[0].text == "(" \
            and find_matching_paren(lam, 0) == len(lam) - 1 \
            and any(t.text == "->" for t in lam[1:-1]):
        # outer grouping paren around the whole lambda; a (p1, p2)
        # parameter list's paren closes before the arrow, so it never
        # matches the last token
        lam = lam[1:-1]
    arrow = next((k for k, t in enumerate(lam) if t.text == "->"), None)
    if arrow is None:
        raise ValueError("$internal$bind needs a lambda argument")
    head = lam[:arrow]
    params = [t.text for t in head if t.kind == "ident"]
    body = lam[arrow + 1:]
    k = len(consts)
    bound, rest = params[:k], params[k:]
    out_body: list[Tok] = []
    for t in body:
        if t.kind == "ident" and t.text in bound \
                and not (out_body and out_body[-1].text == "."):
            out_body += _paren(list(consts[bound.index(t.text)]))
        else:
            out_body.append(t)
    if not rest:
        return [op("("), op(")"), op("->")] + out_body
    if len(rest) == 1:
        return [ident(rest[0]), op("->")] + out_body
    head_out: list[Tok] = [op("(")]
    for j, p in enumerate(rest):
        if j:
            head_out.append(op(","))
        head_out.append(ident(p))
    return head_out + [op(")"), op("->")] + out_body


def _concat_rule(args: Args) -> list[Tok]:
    # concat over arrays with a literal NULL argument returns NULL
    # typed from the array operands (ConcatFunction
    # RETURN_NULL_ON_NULL); Spark cannot type the bare literal
    def is_null(a: list[Tok]) -> bool:
        return len(a) == 1 and a[0].is_kw("NULL")

    def is_arrayish(a: list[Tok]) -> bool:
        return bool(a) and a[0].kind == "ident" \
            and a[0].upper == "ARRAY" and len(a) > 1 \
            and a[1].text in ("[", "(")

    if len(args) >= 2 and any(is_null(a) for a in args) \
            and any(is_arrayish(a) for a in args):
        keep = [a for a in args if not is_null(a)]
        return _template("IF(true, NULL, __C__)", c=_call("concat", *keep))
    return _call("concat", *args)


def _log2_or_log(args: Args) -> list[Tok]:
    # Presto log(b, x) and Spark log(base, expr) agree; passthrough exists
    # only to document the check.
    return _call("log", *args)


def _geometric_mean(args: Args) -> list[Tok]:
    return _call("exp", _call("avg", _call("ln", args[0])))


def _year_of_week(args: Args) -> list[Tok]:
    return _call("extract", [ident("YEAROFWEEK"), ident("FROM")] + args[0])


def _json_array_get(args: Args) -> list[Tok]:
    # json_array_get(j, i): 0-based index into a JSON array; a JSON
    # null ELEMENT is SQL NULL (TestJsonFunctions.java:126-153) —
    # get_json_object renders it as the text 'null'.  (A string element
    # "null" comes back unquoted from get_json_object and collides;
    # the reference's own tests don't distinguish the two.)
    path = _call("concat", [string_literal("$[")],
                 _call("cast", args[1] + [ident("AS"), ident("STRING")]),
                 [string_literal("]")])
    return _call("nullif", _call("get_json_object", args[0], path),
                 [string_literal("null")])


_TRY_FN = {
    # Presto functions whose failure mode Spark covers with a try_* twin
    "element_at": "try_element_at",
    "to_date": "try_to_date",
    "date_parse": None,  # handled by its own rule first; see below
}


def _map_concat(args: Args) -> list[Tok]:
    # map_concat(m1, m2, …) (MapConcatFunction.java:123-170): the value
    # from the LAST map containing a key wins — it walks maps back to
    # front keeping first-seen keys.  Spark's map_concat raises
    # DUPLICATED_MAP_KEY instead, so dedup over the reversed entry
    # stream.  A NULL map argument nulls the result on both engines
    # (concat/transform propagate it).
    if len(args) <= 1:
        return _call("map_concat", *args)
    entries = _call(
        "reverse",
        _call("concat", *[_call("map_entries", a) for a in args]),
    )
    keys = _call(
        "array_distinct",
        _call("transform", entries,
              [ident("__mce"), op("->"), ident("__mce"), op("."),
               ident("key")]),
    )
    first_lam = (
        [ident("__mck"), op("->")]
        + _call(
            "element_at",
            _call("filter", entries,
                  [ident("__mcf"), op("->"), ident("__mcf"), op("."),
                   ident("key"), op("="), ident("__mck")]),
            [Tok("number", "1")],
        )
        + [op("."), ident("value")]
    )
    return _call("map_from_arrays", keys, _call("transform", keys, first_lam))


def _array_position_rule(args: Args) -> list[Tok]:
    # array_position(x, NULL) → NULL (TestArrayOperators.java:672-673);
    # Spark rejects the untyped NULL argument outright
    if len(args) == 2 and len(args[1]) == 1 and args[1][0].is_kw("NULL"):
        return tokenize("CAST(NULL AS BIGINT)")
    # Presto coerces mixed-precision DECIMAL (and decimal-vs-integer)
    # probes to a common supertype; Spark's array_position demands the
    # exact element type.  When the probe is a bare numeric literal,
    # search with a comparison instead (binary comparison coerces) —
    # columns keep the native builtin.
    if len(args) == 2 and len(args[1]) == 1 and args[1][0].kind == "number":
        return _template(
            "(CASE WHEN __A__ IS NULL THEN CAST(NULL AS BIGINT) "
            "ELSE CAST(coalesce(get(filter(transform(__A__, "
            "(__ape, __api) -> IF(__ape = __X__, __api + 1, "
            "CAST(NULL AS INT))), __app -> __app IS NOT NULL), 0), 0) "
            "AS BIGINT) END)",
            a=args[0], x=args[1])
    return _call("array_position", *args)


def _arr_minmax_sql(name: str, args: Args) -> list[Tok]:
    # ArrayMinMaxUtils.java:41 — the first NULL position nulls the
    # result; a NULL array input also yields NULL (the CASE's NULL
    # condition falls to the ELSE branch, where Spark's built-in
    # propagates the NULL array)
    return _template(
        f"(CASE WHEN exists(__A__, __amx -> __amx IS NULL) "
        f"THEN NULL ELSE {name}(__A__) END)",
        a=args[0],
    )


def _greatest_least(name: str, args: Args) -> list[Tok]:
    # ANY NULL argument nulls the result (AbstractGreatestLeast.java:118
    # RETURN_NULL_ON_NULL); Spark's greatest/least skip NULLs instead.
    # The single-argument form is the identity in the reference
    # (variadic signature, min arity 1) — Spark requires two arguments.
    if len(args) == 1:
        return _paren(list(args[0]))
    if not args:
        return _call(name)
    cond: list[Tok] = []
    for a in args:
        if cond:
            cond.append(ident("OR"))
        cond += _paren(list(a)) + [ident("IS"), ident("NULL")]
    return (
        [op("("), ident("CASE"), ident("WHEN")] + cond
        + [ident("THEN"), ident("NULL"), ident("ELSE")]
        + _call(name, *args) + [ident("END"), op(")")]
    )


def _try(args: Args) -> list[Tok]:
    # try(expr) (TryFunction.java): NULL on error. Spark has no generic
    # form; translate the failure shapes Spark has try_* twins for.
    if len(args) != 1:
        raise ValueError("try() takes one argument")
    inner = args[0]
    from facebook_presto_spark.sqlfront.tokens import split_top_level

    has_comparison = any(
        t.text in ("=", "!=", "<>", "<", ">", "<=", ">=") for t in inner
    )
    if not has_comparison:
        # try(a op b) → try_divide/try_multiply/try_add/try_subtract(a, b)
        for op_text, fn in (("/", "try_divide"), ("*", "try_multiply"),
                            ("+", "try_add"), ("-", "try_subtract")):
            halves = split_top_level(inner, op_text)
            if len(halves) == 2 and all(halves):
                return _call(fn, halves[0], halves[1])
        if inner and inner[0].is_kw("CAST"):
            return [ident("try_cast")] + inner[1:]
        # try(fn(...)) where Spark has a try_ twin (element_at → NULL
        # instead of error on bad subscript, etc.)
        if (
            len(inner) >= 3
            and inner[0].kind == "ident"
            and inner[1].text == "("
            and _TRY_FN.get(inner[0].text.lower())
        ):
            return [ident(_TRY_FN[inner[0].text.lower()])] + inner[1:]
        # try(abs(x)): the one abs error Presto raises is bigint negation
        # overflow (AbstractTestQueries testTry#19 — abs(-2^63)); with
        # ANSI off Spark wraps instead, leaving TRY nothing to suppress.
        # Guard the exact overflow input; typeof() keeps double/real abs
        # (which never errors) on the plain path.
        if (
            len(inner) >= 3 and inner[0].is_kw("ABS")
            and inner[1].text == "(" and inner[-1].text == ")"
        ):
            arg = inner[2:-1]
            return _template(
                "(CASE WHEN typeof(__A__) = 'bigint' AND __A__ = "
                "CAST('-9223372036854775808' AS BIGINT) "
                "THEN CAST(NULL AS BIGINT) ELSE abs(__A__) END)",
                a=arg,
            )
        # try(MAP(k, v)): MapConstructor.java raises on NULL or
        # duplicate keys and TryFunction turns that into NULL; Spark's
        # NULL_MAP_KEY / DUPLICATED_MAP_KEY are runtime errors ANSI-off
        # doesn't soften, so guard both conditions explicitly
        # (AbstractTestQueries testMaps "map key cannot be null" shape)
        if (
            len(inner) >= 3 and inner[0].kind == "ident"
            and inner[0].text.lower() == "map_from_arrays"
            and inner[1].text == "("
            and find_matching_paren(inner, 1) == len(inner) - 1
        ):
            kv = split_top_level(inner[2:-1])
            if len(kv) == 2:
                # mismatched lengths too: MapConstructor.java:137 "Key
                # and value arrays must be the same length" is an
                # INVALID_FUNCTION_ARGUMENT TryFunction converts to NULL
                return _template(
                    "(CASE WHEN __K__ IS NULL OR __V__ IS NULL "
                    "OR size(__K__) <> size(__V__) "
                    "OR exists(__K__, __fps_tk -> __fps_tk IS NULL) "
                    "OR size(__K__) <> size(array_distinct(__K__)) "
                    "THEN NULL ELSE map_from_arrays(__K__, __V__) END)",
                    k=kv[0], v=kv[1],
                )
    # Everything else: evaluate the expression directly.  The session runs
    # with ANSI off, so the error classes Presto's TRY suppresses
    # (division by zero inside comparisons, malformed JSON, bad radixes)
    # already yield NULL in Spark; genuinely unsuppressable errors surface
    # loudly rather than silently diverging.
    return _paren(inner)


def _bitwise(op_text: str):
    def rule(args: Args) -> list[Tok]:
        return _paren(args[0] + [op(op_text)] + args[1])
    return rule


def _bitwise_not(args: Args) -> list[Tok]:
    return _paren([op("~")] + args[0])


def _to_utf8(args: Args) -> list[Tok]:
    return _call("encode", args[0], [string_literal("UTF-8")])


def _from_utf8(args: Args) -> list[Tok]:
    # Lenient decode (StringFunctions.fromUtf8): invalid byte sequences
    # become U+FFFD — Spark's decode(…, 'UTF-8') raises
    # MALFORMED_CHARACTER_CODING, and a bare binary→string CAST is a
    # zero-copy reinterpret that keeps the raw invalid bytes, so
    # make_valid_utf8 performs the actual substitution.  The 2-arg form
    # swaps in a custom replacement (codepoint or single-char string;
    # '' strips).  Valid text containing a real U+FFFD is
    # indistinguishable from a substitution — the same ambiguity the
    # reference's output has.
    base = _template("make_valid_utf8(CAST(__B__ AS STRING))", b=args[0])
    if len(args) == 1:
        return base
    r = args[1]
    if len(r) == 1 and r[0].kind == "number":
        r = _chr([r])
    return _call("replace", base, [string_literal("\ufffd")], r)


def _to_iso8601(args: Args) -> list[Tok]:
    # timestamps render with a 'T' separator; dates pass through unchanged
    # under this pattern (Presto to_iso8601 accepts both).
    return _call("date_format", args[0],
                 [string_literal("yyyy-MM-dd'T'HH:mm:ss.SSS")])


def _template(sql: str, **slots: list[Tok]) -> list[Tok]:
    """Tokenize a Spark-SQL fragment, splicing arg token lists at __NAME__."""
    from facebook_presto_spark.sqlfront.tokens import tokenize

    out: list[Tok] = []
    for t in tokenize(sql):
        key = t.text.strip("_").lower() if t.kind == "ident" else ""
        if t.kind == "ident" and t.text.startswith("__") and key in slots:
            out.extend(slots[key])
        else:
            out.append(t)
    return out


def _hamming_distance(args: Args) -> list[Tok]:
    # HammingDistanceFunction.java: count of differing positions between
    # equal-length strings — zip char arrays, count mismatches JVM-side.
    return _template(
        "aggregate(zip_with(split(__A__, ''), split(__B__, ''), "
        "(x, y) -> IF(x = y, 0, 1)), 0, (s, v) -> s + v)",
        a=args[0], b=args[1],
    )



def _make_set_digest(args: Args) -> list[Tok]:
    """make_set_digest(x) (BuildSetDigestAggregation.java) — the bottom-k
    xxhash64 representation as one aggregate expression
    (functions/sketch_fns.make_set_digest's tree)."""
    return _sql(
        "slice(array_sort(collect_set(xxhash64({x}))), 1, 8192)", x=args[0])


def _merge_set_digest(args: Args) -> list[Tok]:
    """merge_set_digest(d) (MergeSetDigestAggregation.java)."""
    return _sql(
        "slice(array_sort(array_distinct(flatten(collect_list({d})))), 1, 8192)",
        d=args[0])


def _qdigest_agg(args: Args) -> list[Tok]:
    """qdigest_agg(x) (QuantileDigestAggregationFunction.java:58) — the
    bucket-count map over the SQL-UDF qdigest_bucket (sketch_fns.
    qdigest_agg's tree; the collect_list repeats, Spark computes one)."""
    vals = "collect_list(qdigest_bucket(CAST({x} AS BIGINT)))"
    keys = f"array_sort(array_distinct({vals}))"
    return _sql(
        f"map_from_arrays({keys}, transform({keys}, "
        f"__k -> CAST(size(filter({vals}, __v -> __v = __k)) AS BIGINT)))",
        x=args[0])


def _merge_qdigest(args: Args) -> list[Tok]:
    """merge(qdigest) — key-wise count addition (sketch_fns.merge_qdigest)."""
    entries = "flatten(transform(collect_list({d}), __m -> map_entries(__m)))"
    keys = f"array_sort(array_distinct(transform({entries}, __e -> __e.key)))"
    return _sql(
        f"map_from_arrays({keys}, transform({keys}, "
        f"__k -> aggregate(filter({entries}, __e -> __e.key = __k), "
        f"CAST(0 AS BIGINT), (__a, __e) -> __a + __e.value)))",
        d=args[0])


def _cardinality(args: Args) -> list[Tok]:
    """cardinality(x) — arrays/maps keep Spark's cardinality; over an
    HLL sketch expression (HyperLogLogFunctions.java:31) it becomes
    hll_sketch_estimate.  Inner calls are already rewritten when this
    rule runs, so the sketch case is detected by the Spark names (plus
    the Presto spellings, defensively)."""
    if len(args) == 1:
        inner = args[0]
        for k, t in enumerate(inner):
            if (
                t.kind == "ident"
                and k + 1 < len(inner)
                and inner[k + 1].text == "("
                and t.text.lower() in (
                    "hll_sketch_agg", "hll_union_agg", "approx_set", "merge",
                )
            ):
                return _call("hll_sketch_estimate", inner)
        # the SetDigest aggregate expansions (rules below) carry the
        # distinctive bottom-k signature: slice(array_sort(...), 1, 8192)
        # over an xxhash64 collect / a flatten-distinct merge
        names = {
            t.text.lower()
            for k, t in enumerate(inner)
            if t.kind == "ident" and k + 1 < len(inner)
            and inner[k + 1].text == "("
        }
        has_8192 = any(t.text == "8192" for t in inner)
        if has_8192 and "slice" in names and (
            "xxhash64" in names
            or {"array_distinct", "flatten", "collect_list"} <= names
        ):
            return _call("cardinality_setdigest", inner)
    return _call("cardinality", *args)

RULES: dict[str, object] = {
    "map": _map_ctor,
    "bitwise_and": _bitwise("&"),
    "bitwise_or": _bitwise("|"),
    "bitwise_xor": _bitwise("^"),
    "bitwise_not": _bitwise_not,
    "to_utf8": _to_utf8,
    "from_utf8": _from_utf8,
    "to_iso8601": _to_iso8601,
    "hamming_distance": _hamming_distance,
    "approx_percentile": _approx_percentile,
    "kurtosis": _kurtosis,
    # apply(x, f) (ApplyFunction.java, reg FunctionRegistry.java:644):
    # invoke a lambda on a scalar — Spark only applies lambdas through
    # higher-order array functions, so route through a 1-element array.
    "apply": lambda args: _call(
        "element_at", _call("transform", _call("array", args[0]), args[1]),
        [Tok("number", "1")]),
    # grouping(c1, …, cn) returns the bitmask over ITS argument list
    # (first = most significant bit, GroupingOperationRewriter.java) for
    # any subset/order of the grouped columns.  Spark's grouping_id
    # requires the exact GROUP BY column order, so compose from
    # single-column grouping() bits instead.
    "grouping": _grouping,
    # count() with no arguments is count(*) (CountAggregation.java binds a
    # zero-arg signature).
    "count": lambda args: (
        [ident("count"), op("("), op("*"), op(")")] if not any(args)
        else _call("count", *args)),
    # Teradata plugin (presto-teradata-functions): literal format strings
    # translate to Spark patterns at rewrite time.
    "to_char": lambda args: _teradata_dt("date_format", args, fmt_last=True),
    "to_date": lambda args: _teradata_dt("to_date", args, fmt_last=True),
    "to_timestamp": lambda args: _teradata_dt("to_timestamp", args, fmt_last=True),
    "index": lambda args: _sql(
        "CAST(instr({a}, {b}) AS BIGINT)", a=args[0], b=args[1]),
    "char2hexint": lambda args: _sql(
        "upper(hex(encode({x}, 'UTF-16BE')))", x=args[0]),
    "timezone_hour": lambda args: _timezone_part(args, minute=False),
    "timezone_minute": lambda args: _timezone_part(args, minute=True),
    "date_add": _date_add,
    "date_diff": _date_diff,
    "date_format": _date_format,
    "date_parse": _date_parse,
    "from_unixtime": _from_unixtime,
    "to_unixtime": _to_unixtime,
    "day_of_week": _day_of_week,
    "dow": _day_of_week,
    "year_of_week": _year_of_week,
    "yow": _year_of_week,
    "if": _if_fn,
    "zip": _zip,
    "min": _min_max_n(True),
    "max": _min_max_n(False),
    "min_by": _min_max_by_n(True),
    "max_by": _min_max_by_n(False),
    "histogram": _histogram,
    "cardinality": _cardinality,
    "make_set_digest": _make_set_digest,
    "merge_set_digest": _merge_set_digest,
    "qdigest_agg": _qdigest_agg,
    "merge_qdigest": _merge_qdigest,
    # empty_approx_set() (HyperLogLogFunctions.java:39): an empty sketch
    # literal via an empty-relation aggregate
    "empty_approx_set": lambda args: _sql(
        "(SELECT hll_sketch_agg(id) FROM range(0))"),
    "ngrams": _ngrams,
    "to_milliseconds": _to_milliseconds,
    "millisecond": _millisecond,
    "normalize": _normalize,
    "width_bucket": _width_bucket,
    # geospatial (presto-geospatial plugin; scalars register by name in
    # functions/geo_sql.py — only overloads/aggregates need rewrites)
    "bing_tile": _bing_tile,
    "spatial_partitions": _spatial_partitions,
    "geometry_union_agg": _geometry_union_agg,
    "convex_hull_agg": _convex_hull_agg,
    "spatial_partitioning": _spatial_partitioning,
    # hidden ANALYZE-support aggregates (quoted-name-only in the
    # reference; translate._pass_functions resolves quoted calls)
    "$internal$sum_data_size_for_stats": _data_size_for_stats("sum"),
    "$internal$max_data_size_for_stats": _data_size_for_stats("max"),
    "multimap_agg": _multimap_agg,
    "map_union": _map_union,
    "reduce_agg": _reduce_agg,
    # arbitrary(x) skips NULL inputs (ArbitraryAggregationFunction.java:154
    # BLOCK_INPUT_CHANNEL — non-nullable); Spark's any_value keeps them
    # unless told otherwise, so the ignoreNulls flag is load-bearing
    "arbitrary": lambda args: _call("any_value", args[0],
                                    [ident("true")]),
    "any_value": lambda args: _call("any_value", args[0],
                                    [ident("true")]),
    "json_size": _json_size,
    "json_array_contains": _json_array_contains,
    "parse_duration": _parse_duration,
    "cosine_similarity": _cosine_similarity,
    "array_agg": _array_agg,
    "md5": _digest_binary("md5"),
    "sha1": _digest_binary("sha1"),
    "sha256": _sha2("256"),
    "sha512": _sha2("512"),
    "url_extract_port": _url_extract_port,
    "split": _split,
    "regexp_extract": _regexp_extract,
    "regexp_replace": _regexp_replace,
    "regexp_extract_all": _regexp_extract_all,
    "regexp_split": _regexp_split_rule,
    "url_extract_parameter": _url_extract_parameter,
    "random": _random,
    "rand": _random,
    "is_json_scalar": _is_json_scalar,
    "wilson_interval_lower": _wilson("-"),
    "wilson_interval_upper": _wilson("+"),
    "multimap_from_entries": _multimap_from_entries,
    "map_from_entries": _map_from_entries,
    "array_except": _array_except_rule,
    "normal_cdf": _normal_cdf,
    "reduce": _reduce_rule,
    "$internal$try": _internal_try,
    "invoke": _invoke,
    "$internal$bind": _internal_bind,
    "concat": _concat_rule,
    "contains": _contains,
    "numeric_histogram": _numeric_histogram,
    "map_agg": _map_agg,
    "checksum": _checksum,
    "features": _features,
    "learn_classifier": _learn_agg("ml_learn_classifier"),
    "learn_libsvm_classifier": _learn_agg("ml_learn_classifier"),
    "learn_regressor": _learn_agg("ml_learn_regressor", cast_label=True),
    "learn_libsvm_regressor": _learn_agg("ml_learn_regressor", cast_label=True),
    "truncate": _truncate,
    "infinity": _infinity,
    "nan": _nan,
    "is_finite": _is_finite,
    "to_base": _to_base,
    "from_base": _from_base,
    "geometric_mean": _geometric_mean,
    "json_array_get": _json_array_get,
    # JSON is carried as a string; json_parse validates (NULL on malformed,
    # the TRY-suppressed error path) and canonicalizes whitespace like the
    # reference's JsonFunctions.jsonParse.
    "json_parse": lambda args: _call(
        "to_json", _call("try_parse_json", args[0])),
    "json_format": lambda args: list(args[0]),
    "try": _try,
    "greatest": lambda args: _greatest_least("greatest", args),
    "least": lambda args: _greatest_least("least", args),
    # TypeOfFunction.java renders StandardTypes spellings (the UDF is
    # a metadata corner; the hot-path integer-cast dispatch uses the
    # __spark_typeof alias below and stays JVM-side)
    "typeof": lambda args: _call(
        "presto_typeof_name", _call("typeof", *args)),
    "__spark_typeof": lambda args: _call("typeof", *args),
    # BitwiseFunctions.bitCount(x, bits): count within the bits-wide
    # two's complement of x; Spark's bit_count is 64-bit-only
    "bit_count": lambda args: _call("bit_count", args[0]) if len(args) == 1
    else _call(
        "bit_count",
        _paren(list(args[0])) + [op("&")] + _template(
            "(CASE WHEN __B__ = 64 THEN -1 "
            "ELSE shiftleft(CAST(1 AS BIGINT), CAST(__B__ AS INT)) - 1 "
            "END)", b=args[1])),
    "is_nan": _is_nan,
    "is_infinite": _is_infinite,
    "chr": _chr,
    "replace": _replace,
    "substr": _substr_rule,
    "substring": _substr_rule,
    "split_part": _split_part,
    "split_to_map": _split_to_map,
    "split_to_multimap": _split_to_multimap,
    "trim": _trim_rule("b"),
    "ltrim": _trim_rule("l"),
    "rtrim": _trim_rule("r"),
    "map_concat": _map_concat,
    # a NULL ELEMENT nulls array_min/array_max
    # (ArrayMinMaxUtils.java:41); Spark's built-ins skip nulls
    "array_min": lambda args: _arr_minmax_sql("array_min", args),
    "array_max": lambda args: _arr_minmax_sql("array_max", args),
    "array_position": _array_position_rule,
    # the reference iterates the LONGER array in its order
    # (ArrayIntersectFunction.java:46-75); Spark keeps the first
    # argument's order — swap when the second is longer
    "array_intersect": lambda args: _template(
        "(CASE WHEN size(__A__) < size(__B__) "
        "THEN array_intersect(__B__, __A__) "
        "ELSE array_intersect(__A__, __B__) END)",
        a=args[0], b=args[1]),
    # flatten SKIPS null sub-arrays (TestArrayOperators.java:779-783 —
    # flatten([NULL, [x]]) = [x]); Spark's flatten nulls the result
    "flatten": lambda args: _template(
        "flatten(filter(__A__, __fl -> __fl IS NOT NULL))", a=args[0]),
}
for _name, _part in _URL_PART.items():
    RULES[_name] = _url_extract(_part)
