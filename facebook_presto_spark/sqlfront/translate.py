"""Presto-SQL → Spark-SQL translation passes.

Token-level rewrites bridging the dialect gaps SURVEY.md §7 lists; each pass
names the reference behavior it matches:

1. typed string literals  — ``DOUBLE '1.5'`` → ``CAST('1.5' AS DOUBLE)``
2. UNNEST → LATERAL VIEW  — UnnestOperator (operator/UnnestOperator.java:35),
   ``WITH ORDINALITY`` via posexplode (+1 for Presto's 1-based ordinality)
3. quantified comparisons — ALL/ANY/SOME (SqlBase.g4:254,329) rewritten to
   min/max scalar subqueries / IN, the same trick the reference applies in
   TransformQuantifiedComparisonApplyToLateralJoin.java
4. function calls         — per-function rules (functions.py)
5. ORDER BY null ordering — Presto defaults NULLS LAST for ASC & DESC
   (sql/planner/QueryPlanner.java:936-954); Spark's ASC default is
   NULLS FIRST, so ASC keys get an explicit NULLS LAST
6. TABLESAMPLE BERNOULLI(p) → TABLESAMPLE (p PERCENT); FETCH FIRST → LIMIT

Known gaps (raise or pass through): multi-array UNNEST(a, b), generic
``try()`` beyond division/CAST, integer-division `/` retyping (Presto
int/int truncates; write ``div`` explicitly).
"""

from __future__ import annotations

import re

from facebook_presto_spark.sqlfront.functions import RENAME, RULES, _call
from facebook_presto_spark.sqlfront.tokens import (
    Tok,
    find_matching_paren,
    ident,
    op,
    render,
    split_top_level,
    string_literal,
    string_value,
    tokenize,
)

_CAST_TYPES = {
    "DOUBLE", "REAL", "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "VARCHAR", "CHAR", "BOOLEAN",
}


# field-extraction functions that read the LOCAL datetime of a
# zone-carrying value (DateTimeFunctions.java evaluates them in the
# value's zone, not the session zone)
_LOCAL_FIELD_FNS = (
    "HOUR", "MINUTE", "SECOND", "MILLISECOND", "DAY", "DAY_OF_MONTH",
    "MONTH", "YEAR", "QUARTER", "DAY_OF_WEEK", "DOW", "DAY_OF_YEAR",
    "DOY", "WEEK", "WEEK_OF_YEAR", "YEAR_OF_WEEK", "YOW",
)

_TZ_LIT_RE = None  # compiled lazily below


def _parse_tz_literal(kind: str, body: str):
    """Parse ``TIMESTAMP/TIME '<local> <zone>'``.  Returns (local_dt_or_t,
    zone_text, offset_minutes, utc_rendering) or None when the literal
    carries no zone.  Named zones resolve through tzdata at translation
    time — deterministic, and Spark never sees a syntax it can't parse."""
    import datetime as dt
    import re as _re
    import zoneinfo

    m = _re.fullmatch(
        r"\s*(.*?)\s+(([+-]\d{2}:\d{2})|([A-Za-z][\w/+-]*(?:/[\w+-]+)*))\s*",
        body,
    )
    if not m or m.group(2).upper() in ("AM", "PM"):
        return None
    local_text, zone_text = m.group(1), m.group(2)
    try:
        if kind == "TIMESTAMP":
            fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in local_text else "%Y-%m-%d %H:%M:%S"
            if len(local_text) == 10:
                fmt = "%Y-%m-%d"
            local = dt.datetime.strptime(local_text, fmt)
        else:
            fmt = "%H:%M:%S.%f" if "." in local_text else "%H:%M:%S"
            local = dt.datetime.strptime("1970-01-01 " + local_text,
                                         "%Y-%m-%d " + fmt)
    except ValueError:
        return None
    if m.group(3):
        sign = 1 if zone_text[0] == "+" else -1
        offset_min = sign * (int(zone_text[1:3]) * 60 + int(zone_text[4:6]))
    else:
        try:
            tz = zoneinfo.ZoneInfo(zone_text)
        except Exception:
            return None
        offset_min = int(
            local.replace(tzinfo=tz).utcoffset().total_seconds() // 60
        )
    utc = local - dt.timedelta(minutes=offset_min)
    if kind == "TIMESTAMP":
        utc_text = utc.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    else:
        utc_text = utc.strftime("%H:%M:%S.%f")[:-3]
    return local, zone_text, offset_min, utc_text


def _render_presto_tz(kind: str, local, zone_text: str) -> str:
    """The reference's varchar rendering of a zoned value
    (DateTimeUtils.printTimestampWithTimeZone): local millis + zone."""
    if kind == "TIMESTAMP":
        return local.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3] + " " + zone_text
    return local.strftime("%H:%M:%S.%f")[:-3] + " " + zone_text


def _pass_tz_literals(tokens: list[Tok]) -> list[Tok]:
    """``TIMESTAMP/TIME '<local> <zone>'`` literals — the packed
    TIMESTAMP WITH TIME ZONE surface (spi/type/DateTimeEncoding.java
    packs the zone key next to the instant).

    Spark has a single instant-only timestamp type, so the zone cannot
    travel with a general value; what CAN be honored exactly is every
    context where the zone of a *literal* is observable, resolved at
    translation time (the reference resolves literal zones in the
    analyzer too):

    - field extraction (``hour(TIMESTAMP '… +05:00')``) reads the LOCAL
      field → the zone is stripped, keeping the local datetime;
    - ``timezone_hour/timezone_minute(literal)`` → constant offset
      (named zones resolved through tzdata at the literal's instant);
    - ``CAST(literal AS VARCHAR)`` → the reference's rendering with the
      zone preserved, as a constant;
    - every other context → the UTC instant (unchanged semantics:
      comparisons/arithmetic are instant-based in the reference too).

    Zone-typed COLUMNS cannot exist here (no Spark storage type carries
    a per-value zone) — documented in COVERAGE.md.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if (
            t.is_kw("TIMESTAMP", "TIME") and i + 1 < n
            and tokens[i + 1].kind == "string"
        ):
            kind = t.upper
            parsed = _parse_tz_literal(kind, string_value(tokens[i + 1]))
            if parsed is None:
                out += [t, tokens[i + 1]]
                i += 2
                continue
            local, zone_text, offset_min, utc_text = parsed
            prev2 = out[-2] if len(out) >= 2 else None
            prev1 = out[-1] if out else None
            nxt = tokens[i + 2] if i + 2 < n else None
            # fn( literal )  — the zone-observing call contexts
            if (
                prev1 is not None and prev1.text == "("
                and prev2 is not None and prev2.kind == "ident"
                and nxt is not None and nxt.text == ")"
            ):
                fn = prev2.upper
                if fn in ("TIMEZONE_HOUR", "TIMEZONE_MINUTE"):
                    # Java integer division truncates toward zero:
                    # -05:30 → hour -5, minute -30 (DateTimeFunctions)
                    trunc_h = int(offset_min / 60)
                    val = (trunc_h if fn == "TIMEZONE_HOUR"
                           else offset_min - trunc_h * 60)
                    del out[-2:]
                    out.append(Tok("number", str(val)))
                    i += 3
                    continue
                if fn in _LOCAL_FIELD_FNS:
                    local_text = (
                        local.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
                        if kind == "TIMESTAMP"
                        else local.strftime("%H:%M:%S.%f")[:-3]
                    )
                    out += [t, string_literal(local_text)]
                    i += 2
                    continue
            # CAST( literal AS VARCHAR )
            if (
                prev1 is not None and prev1.text == "("
                and prev2 is not None and prev2.is_kw("CAST", "TRY_CAST")
                and nxt is not None and nxt.is_kw("AS")
                and i + 3 < n and tokens[i + 3].is_kw("VARCHAR")
                and i + 4 < n and tokens[i + 4].text == ")"
            ):
                del out[-2:]
                out.append(string_literal(_render_presto_tz(kind, local, zone_text)))
                i += 5
                continue
            # default: the UTC instant
            out += [t, string_literal(utc_text)]
            i += 2
            continue
        out.append(t)
        i += 1
    return out


def _pass_typed_literals(tokens: list[Tok]) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        nxt = tokens[i + 1] if i + 1 < len(tokens) else None
        if nxt is not None and nxt.kind == "string" and t.kind == "ident":
            u = t.text.upper()
            if u in _CAST_TYPES:
                out.extend([ident("CAST"), op("("), nxt, ident("AS"),
                            ident("DOUBLE" if u == "REAL" else u), op(")")])
                i += 2
                continue
            if u == "DECIMAL":
                body = nxt.text[1:-1].lstrip("+-")
                digits = body.replace(".", "")
                scale = len(body.split(".")[1]) if "." in body else 0
                out.extend([ident("CAST"), op("("), nxt, ident("AS"),
                            ident(f"DECIMAL({max(len(digits), 1)},{scale})"), op(")")])
                i += 2
                continue
            if u == "JSON":
                # validate + canonicalize like json_parse (NULL on
                # malformed text — the error Presto's TRY suppresses)
                out.extend([ident("to_json"), op("("),
                            ident("try_parse_json"), op("("), nxt,
                            op(")"), op(")")])
                i += 2
                continue
        out.append(t)
        i += 1
    return out


# keywords that can directly follow an UNNEST(...) relation and therefore
# must not be mistaken for its alias
_UNNEST_ALIAS_STOP = (
    "WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "JOIN", "CROSS", "LEFT",
    "RIGHT", "INNER", "FULL", "LATERAL", "ON", "USING", "UNION", "EXCEPT",
    "INTERSECT", "WITH", "OFFSET", "FETCH", "TABLESAMPLE", "AS", "SELECT",
)


_JOINISH = ("CROSS", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "NATURAL")


def _pass_lateral_join_fixup(tokens: list[Tok]) -> list[Tok]:
    """Make _pass_unnest's LATERAL VIEW output composable with joins.

    Spark's grammar hangs lateral views off the END of the whole FROM
    relation, so two Presto shapes land on text Spark can't parse:

    * ``FROM UNNEST(…) t(a, b) CROSS JOIN r`` — a lateral view followed
      by a join → wrap the dummy-base lateral view as a derived table
      ``( SELECT a, b FROM (SELECT 1) … LATERAL VIEW … ) t`` so the
      join applies to a plain relation (testUnnest#12/#24 shapes);
    * ``FROM ( r CROSS JOIN UNNEST(r.a) t(col) )`` — a PARENTHESIZED
      relation containing a lateral view → the parens are redundant
      once the unnest is a lateral view, so strip them
      (testCrossJoinUnnestWithUnion#0 shape).

    Both activations were Spark ParseExceptions before, so the fixup
    cannot regress a previously working query.
    """
    # recurse first so nested subqueries are already fixed
    out: list[Tok] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            inner = _pass_lateral_join_fixup(tokens[i + 1:close])
            # paren-strip: a parenthesized relation whose body holds a
            # top-level LATERAL VIEW, not followed by an alias/join —
            # only valid (and only emitted) directly under FROM
            follows_from = bool(out) and out[-1].is_kw("FROM")
            has_lv = any(
                x.is_kw("LATERAL") for x in _depth0_iter(inner)
            ) and any(x.is_kw("VIEW") for x in _depth0_iter(inner))
            nxt = tokens[close + 1] if close + 1 < len(tokens) else None
            tail_ok = nxt is None or nxt.is_kw(
                "GROUP", "WHERE", "ORDER", "LIMIT", "HAVING", "UNION",
                "INTERSECT", "EXCEPT") or nxt.text in (")", ";")
            if follows_from and has_lv and tail_ok:
                out.extend(inner)
            else:
                out += [t] + inner + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    tokens = out

    # wrap: FROM (SELECT 1) __unnest_base LATERAL VIEW fn(…) a AS c,…
    # followed by a join keyword
    j = 0
    n = len(tokens)
    while j < n:
        if not tokens[j].is_kw("FROM"):
            j += 1
            continue
        k = j + 1
        # dummy base emitted by _pass_unnest's FROM-position branch?
        if not (k + 4 < n and tokens[k].text == "("
                and tokens[k + 1].is_kw("SELECT")
                and tokens[k + 2].text == "1" and tokens[k + 3].text == ")"
                and tokens[k + 4].text == "__unnest_base"):
            j += 1
            continue
        p = k + 5
        cols: list[str] = []
        alias = None
        while p + 1 < n and tokens[p].is_kw("LATERAL") \
                and tokens[p + 1].is_kw("VIEW"):
            p += 2
            while p < n and tokens[p].text != "(":
                p += 1
            p = find_matching_paren(tokens, p) + 1
            if p < n and tokens[p].kind == "ident":
                alias = tokens[p].text
                p += 1
            if p < n and tokens[p].is_kw("AS"):
                p += 1
                while p < n and tokens[p].kind == "ident":
                    cols.append(tokens[p].text)
                    p += 1
                    if p < n and tokens[p].text == ",":
                        p += 1
                    else:
                        break
        if alias and cols and p < n and tokens[p].is_kw(*_JOINISH):
            wrapped = [tokens[j], op("("), ident("SELECT")]
            for ci, c in enumerate(cols):
                if ci:
                    wrapped.append(op(","))
                wrapped.append(ident(c))
            wrapped += [ident("FROM")] + tokens[j + 1:p] \
                + [op(")"), ident(alias)]
            tokens = tokens[:j] + wrapped + tokens[p:]
            n = len(tokens)
            j += len(wrapped)
            continue
        j = p if p > j else j + 1
    return tokens


def _pass_unnest(tokens: list[Tok]) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    ord_renames: dict[str, str] = {}
    while i < len(tokens):
        t = tokens[i]
        is_cross = (
            t.is_kw("CROSS") and i + 2 < len(tokens)
            and tokens[i + 1].is_kw("JOIN") and tokens[i + 2].is_kw("UNNEST")
        )
        is_comma = (
            t.text == "," and i + 1 < len(tokens) and tokens[i + 1].is_kw("UNNEST")
        )
        is_from = (
            t.is_kw("FROM") and i + 1 < len(tokens) and tokens[i + 1].is_kw("UNNEST")
        )
        if not (is_cross or is_comma or is_from):
            out.append(t)
            i += 1
            continue
        if is_from:
            # standalone FROM UNNEST(...) (SqlBase.g4:235): LATERAL VIEW
            # needs a base relation — a one-row dummy supplies it
            out.extend([
                ident("FROM"), op("("), ident("SELECT"), Tok("number", "1"),
                op(")"), ident("__unnest_base"),
            ])
        u = i + (2 if is_cross else 1)
        open_p = u + 1
        close_p = find_matching_paren(tokens, open_p)
        exprs = split_top_level(tokens[open_p + 1:close_p])
        j = close_p + 1
        with_ord = False
        if j + 1 < len(tokens) and tokens[j].is_kw("WITH") and tokens[j + 1].is_kw("ORDINALITY"):
            with_ord = True
            j += 2
        # alias is optional ("UNNEST(a) t(x)", "UNNEST(a)" bare) and the AS
        # keyword itself is optional before it (SqlBase.g4 aliasedRelation)
        if j < len(tokens) and tokens[j].is_kw("AS"):
            j += 1
        if (
            j < len(tokens) and tokens[j].kind in ("ident", "qident")
            and not tokens[j].is_kw(*_UNNEST_ALIAS_STOP)
        ):
            alias = tokens[j].text
            if j + 1 < len(tokens) and tokens[j + 1].text == "(":
                cols_open = j + 1
                cols_close = find_matching_paren(tokens, cols_open)
                cols = [g[0].text
                        for g in split_top_level(tokens[cols_open + 1:cols_close])]
                i = cols_close + 1
            else:
                cols = [f"__uc{u}"] + ([f"__uord{u}"] if with_ord else [])
                i = j + 1
        else:
            # synthetic alias — single value column (arrays; an unaliased
            # MAP unnest would need two, which the corpus never does)
            alias = f"__unnest{u}"
            cols = [f"__uc{u}"] + ([f"__uord{u}"] if with_ord else [])
            i = j

        if len(exprs) > 1:
            # UNNEST(a1, a2, …) zips the arrays positionally
            # (UnnestOperator.java NULL-pads the shorter ones — exactly
            # arrays_zip + inline semantics).  WITH ORDINALITY zips a
            # 1-based sequence as the LAST array: its length is the max
            # input size, so it never pads and never extends (the CASE
            # guards sequence(1, 0), which Spark renders descending).
            zipped: list[Tok] = [ident("arrays_zip"), op("(")]
            for k, e in enumerate(exprs):
                if k:
                    zipped.append(op(","))
                zipped.extend(e)
            if with_ord:
                longest: list[Tok] = [ident("greatest"), op("(")]
                for k, e in enumerate(exprs):
                    if k:
                        longest.append(op(","))
                    longest.extend(_call("size", e))
                longest.append(op(")"))
                zipped.append(op(","))
                zipped.extend(
                    [ident("CASE"), ident("WHEN")] + longest
                    + [op("<="), Tok("number", "0"), ident("THEN"),
                       ident("array"), op("("), op(")"), ident("ELSE"),
                       ident("sequence"), op("("), Tok("number", "1"),
                       op(",")] + longest + [op(")"), ident("END")]
                )
            zipped.append(op(")"))
            out.extend([ident("LATERAL"), ident("VIEW")])
            out.extend(_call("inline", zipped))
            out.append(ident(alias))
            # user-specified column list (ordinality adds one column)
            if len(cols) == len(exprs) + (1 if with_ord else 0):
                out.append(ident("AS"))
                for k, c in enumerate(cols):
                    if k:
                        out.append(op(","))
                    out.append(ident(c))
            continue

        out.append(ident("LATERAL"))
        out.append(ident("VIEW"))
        if with_ord:
            ordcol = cols[-1]
            value_cols = cols[:-1]
            pos_name = f"__pos_{ordcol}"
            ord_renames[ordcol] = pos_name
            ord_renames[f"{alias}.{ordcol}"] = pos_name
            out.extend(_call("posexplode", exprs[0]))
            out.append(ident(alias))
            out.append(ident("AS"))
            out.append(ident(pos_name))
            for c in value_cols:
                out.append(op(","))
                out.append(ident(c))
        else:
            out.extend(_call("explode", exprs[0]))
            out.append(ident(alias))
            out.append(ident("AS"))
            for k, c in enumerate(cols):
                if k:
                    out.append(op(","))
                out.append(ident(c))
    if ord_renames:
        renamed: list[Tok] = []
        k = 0
        while k < len(out):
            t = out[k]
            # qualified alias.ordcol
            if (
                t.kind == "ident" and k + 2 < len(out) and out[k + 1].text == "."
                and f"{t.text}.{out[k + 2].text}" in ord_renames
            ):
                pos = ord_renames[f"{t.text}.{out[k + 2].text}"]
                renamed.extend([op("("), ident(pos), op("+"), Tok("number", "1"), op(")")])
                k += 3
                continue
            if t.kind == "ident" and t.text in ord_renames and t.text != ord_renames[t.text]:
                prev_dot = renamed and renamed[-1].text == "."
                if not prev_dot:
                    renamed.extend([op("("), ident(ord_renames[t.text]), op("+"),
                                    Tok("number", "1"), op(")")])
                    k += 1
                    continue
            renamed.append(t)
            k += 1
        out = renamed
    return out


_TYPE_RENAME = {"JSON": "STRING", "VARBINARY": "BINARY", "REAL": "FLOAT",
                # the UNKNOWN type (spi/type/UnknownType.java — the type
                # of a bare NULL) maps to Spark's VOID
                "UNKNOWN": "VOID"}

# type-name heads that can begin an UNNAMED ROW field (ROW(INTEGER,
# INTEGER) — TypeSignature accepts fields without names); used to tell
# `ROW(name TYPE)` from `ROW(TYPE)`
_TYPE_HEADS = {
    "BIGINT", "INTEGER", "INT", "SMALLINT", "TINYINT", "DOUBLE", "REAL",
    "FLOAT", "BOOLEAN", "VARCHAR", "CHAR", "STRING", "VARBINARY",
    "BINARY", "JSON", "DATE", "TIMESTAMP", "TIME", "DECIMAL", "DEC",
    "NUMERIC", "ARRAY", "MAP", "ROW", "UNKNOWN", "INTERVAL",
}


_JSON_PRODUCERS = {"to_json", "json_format"}


def _mark_json_exprs(v: list[Tok]) -> list[Tok]:
    """Prefix JSON-producing subexpressions with the \\x01 sentinel so
    the runtime renderer embeds their text raw (ArrayToJsonCast over
    ARRAY[JSON '…'] keeps element token kinds; a quoted-string
    rendering would double-encode them)."""
    out: list[Tok] = []
    i = 0
    n = len(v)
    while i < n:
        t = v[i]
        if t.kind == "ident" and t.text.lower() in _JSON_PRODUCERS \
                and i + 1 < n and v[i + 1].text == "(":
            close = find_matching_paren(v, i + 1)
            out += (_splice("concat('\x01', __J__)",
                            j=v[i:close + 1]))
            i = close + 1
            continue
        out.append(t)
        i += 1
    return out


def _template_cast_json(v: list[Tok]) -> list[Tok]:
    fn = "presto_json_field"
    if any(t.kind == "ident" and "FLOAT" in t.upper for t in v):
        # the cast target carries REAL/FLOAT somewhere — render floats
        # with Java Float.toString digits (MapToJsonCast over
        # ARRAY<REAL> keys/values)
        fn = "presto_json_field_real"
    body = render(_mark_json_exprs(v))
    return tokenize(
        f"(CASE WHEN ({body}) IS NULL THEN NULL "
        f"ELSE {fn}({body}) END)")


def _angles_to_parens(toks: list[Tok]) -> list[Tok]:
    """Normalize the angle-bracket generic type spelling the reference
    also accepts (``ARRAY<BIGINT>``, ``MAP<K, V>`` — TypeSignature
    parses both) to the paren form the rest of the type machinery
    expects.  Only brackets directly following ARRAY/MAP/ROW (or nested
    inside such a group) convert, so comparison operators elsewhere are
    untouched."""
    out: list[Tok] = []
    depth = 0
    prev_generic = False
    for t in toks:
        if t.text == "<" and (prev_generic or depth > 0):
            out.append(op("("))
            depth += 1
            prev_generic = False
            continue
        if t.text == ">" and depth > 0:
            out.append(op(")"))
            depth -= 1
            prev_generic = False
            continue
        prev_generic = t.kind == "ident" and t.upper in ("ARRAY", "MAP",
                                                         "ROW")
        out.append(t)
    return out


def _type_text(toks: list[Tok]) -> str:
    """Presto type syntax → Spark type syntax (for CAST targets).

    ROW(n T, ...) → STRUCT<n: T, ...>, ARRAY(T) → ARRAY<T>, MAP(K,V) →
    MAP<K, V> (spi/type/TypeSignature.java parametric spellings); bare
    VARCHAR/CHAR → STRING (Spark requires a length parameter, Presto's
    default is unbounded); JSON → STRING; TIMESTAMP WITH TIME ZONE →
    TIMESTAMP (session is UTC, see _pass_at_time_zone).
    """
    out: list[str] = []
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        nxt = toks[i + 1] if i + 1 < n else None
        u = t.upper if t.kind == "ident" else ""
        if u in ("VARCHAR", "CHAR") and not (nxt and nxt.text == "("):
            out.append("STRING")
            i += 1
            continue
        if u in ("DECIMAL", "DEC", "NUMERIC") and not (nxt and nxt.text == "("):
            # Presto's bare DECIMAL defaults to full precision
            # (spi/type/DecimalType.createDecimalType() — p=38, s=0);
            # Spark's bare DECIMAL is decimal(10,0)
            out.append("DECIMAL(38,0)")
            i += 1
            continue
        if u in _TYPE_RENAME:
            out.append(_TYPE_RENAME[u])
            i += 1
            continue
        if u == "DOUBLE" and nxt is not None and nxt.is_kw("PRECISION"):
            out.append("DOUBLE")
            i += 2
            continue
        if u in ("TIMESTAMP", "TIME") and i + 3 < n and toks[i + 1].is_kw("WITH") \
                and toks[i + 2].is_kw("TIME") and toks[i + 3].is_kw("ZONE"):
            out.append("TIMESTAMP")
            i += 4
            continue
        if u in ("ARRAY", "MAP", "ROW") and nxt and nxt.text == "(":
            close = find_matching_paren(toks, i + 1)
            parts = split_top_level(toks[i + 2:close])
            if u == "ARRAY":
                out.append(f"ARRAY<{_type_text(parts[0])}>")
            elif u == "MAP":
                out.append(f"MAP<{_type_text(parts[0])}, {_type_text(parts[1])}>")
            else:
                fields = ", ".join(
                    # unnamed fields (ROW(INTEGER, INTEGER)) take Spark's
                    # positional col{i} constructor names so the cast
                    # composes with struct(...) literals in one array
                    f"col{fi + 1}: {_type_text(p)}"
                    if (len(p) == 1 or p[0].upper in _TYPE_HEADS
                        and (len(p) > 1 and p[1].text == "("))
                    else f"{p[0].text}: {_type_text(p[1:])}"
                    for fi, p in enumerate(parts))
                out.append(f"STRUCT<{fields}>")
            i = close + 1
            continue
        out.append(t.text)
        i += 1
    return " ".join(out)


def _row_as_json(row_toks: list[Tok]) -> list[Tok]:
    """ROW(a, b, …) → its Presto JSON-array rendering as string tokens.

    Nested ROW constructors recurse into nested arrays syntactically;
    every other field routes through the ``presto_json_field`` runtime
    renderer (engine.py registers it), which dispatches on the VALUE's
    runtime type — so struct-typed *columns* inside a ROW cast render as
    JSON arrays exactly like the reference (RowToJsonCast.java), which
    no compile-time spelling can do without the schema.
    """
    parts: list[list[Tok]] = []
    for a in split_top_level(row_toks[2:-1]):
        a = _pass_cast_types(a)
        if (
            len(a) >= 3 and a[0].kind == "ident" and a[0].upper == "ROW"
            and a[1].text == "(" and find_matching_paren(a, 1) == len(a) - 1
        ):
            parts.append(_row_as_json(a))
            continue
        parts.append(
            [ident("presto_json_field"), op("(")] + a + [op(")")]
        )
    out = [ident("concat"), op("("), string_literal("["), op(","),
           ident("concat_ws"), op("("), string_literal(",")]
    for p in parts:
        out += [op(",")] + p
    out += [op(")"), op(","), string_literal("]"), op(")")]
    return out


def _pass_values_lambda(tokens: list[Tok]) -> list[Tok]:
    """``(VALUES …)`` derived tables holding lambda expressions → UNION
    ALL of SELECT arms.

    Spark inline tables reject higher-order-function lambdas
    (AbstractTestQueries testLambdaInValuesAndUnnest); Presto's Values
    node evaluates arbitrary expressions.  ``(VALUES (e1, e2), (f1, f2))
    t(a, b)`` rewrites to ``(SELECT e1 AS a, e2 AS b UNION ALL SELECT f1
    AS a, f2 AS b) t`` — identical rows, and projections are where Spark
    does allow lambdas.  Applied only when a ``->`` appears among the
    rows, so ordinary inline tables keep Catalyst's LocalRelation fast
    path.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            inner = _pass_values_lambda(tokens[i + 1:close])
            if (
                inner and inner[0].is_kw("VALUES")
                and any(tok.text == "->" for tok in inner)
            ):
                rows = split_top_level(inner[1:])
                # optional alias + column list after the close paren
                j = close + 1
                if j < n and tokens[j].is_kw("AS"):
                    j += 1
                alias: list[Tok] = []
                cols: list[list[Tok]] = []
                if j < n and tokens[j].kind in ("ident", "qident") \
                        and not tokens[j].is_kw(*_JOIN_KWS, *_CLAUSE_KWS,
                                                *_SETOP_KWS, "ON", "USING"):
                    alias = [tokens[j]]
                    j += 1
                    if j < n and tokens[j].text == "(":
                        cend = find_matching_paren(tokens, j)
                        cols = split_top_level(tokens[j + 1:cend])
                        j = cend + 1
                arms: list[Tok] = []
                for r, row in enumerate(rows):
                    exprs = (
                        split_top_level(row[1:-1])
                        if len(row) >= 2 and row[0].text == "("
                        and find_matching_paren(row, 0) == len(row) - 1
                        else [row]
                    )
                    if r:
                        arms += [ident("UNION"), ident("ALL")]
                    arms.append(ident("SELECT"))
                    for k, e in enumerate(exprs):
                        if k:
                            arms.append(op(","))
                        arms += [op("(")] + e + [op(")")]
                        if k < len(cols):
                            arms += [ident("AS")] + cols[k]
                out += [op("(")] + arms + [op(")")] + alias
                i = j
                continue
            out += [t] + inner + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    return out


def _entries(expr: list[Tok]) -> list[Tok]:
    return (
        [ident("sort_array"), op("("), ident("map_entries"), op("(")]
        + expr + [op(")"), op(")")]
    )


def _pass_map_in(tokens: list[Tok]) -> list[Tok]:
    """``MAP(…) [NOT] IN (…)`` → entry-array comparison.

    Spark cannot compare MAP types (no ordering/equality on MapType —
    AbstractTestQueries testInUncorrelatedSubquery); the reference
    compares maps structurally.  ``sort_array(map_entries(m))`` is a
    canonical array<struct<key,value>> that Spark CAN compare, and two
    maps are equal iff their sorted entry arrays are.  Both sides
    rewrite: the left MAP constructor, and each element of a literal IN
    list or the (single-column) subquery's output.  Detection is
    syntactic on an explicit MAP constructor — bare map-typed columns
    can't be recognized without a schema.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if (
            t.is_kw("MAP") and i + 1 < n and tokens[i + 1].text == "("
        ):
            close = find_matching_paren(tokens, i + 1)
            j = close + 1
            neg = j < n and tokens[j].is_kw("NOT")
            if neg:
                j += 1
            if (
                j + 1 < n and tokens[j].is_kw("IN")
                and tokens[j + 1].text == "("
            ):
                rhs_close = find_matching_paren(tokens, j + 1)
                lhs = _pass_map_in(tokens[i:close + 1])
                rhs = _pass_map_in(tokens[j + 2:rhs_close])
                out += _entries(lhs)
                if neg:
                    out.append(ident("NOT"))
                out.append(ident("IN"))
                if rhs and rhs[0].is_kw("SELECT", "VALUES", "WITH"):
                    out += (
                        [op("("), ident("SELECT")] + _entries([ident("__mv")])
                        + [ident("FROM"), op("(")] + rhs
                        + [op(")"), ident("__mvq"), op("("), ident("__mv"),
                           op(")"), op(")")]
                    )
                else:
                    out.append(op("("))
                    for k, el in enumerate(split_top_level(rhs)):
                        if k:
                            out.append(op(","))
                        out += _entries(el)
                    out.append(op(")"))
                i = rhs_close + 1
                continue
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            out += [t] + _pass_map_in(tokens[i + 1:close]) + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    return out


_CMP_OPS = ("=", "<>", "!=", "<", "<=", ">", ">=")


def _cast_group_kind(tokens: list[Tok], start: int) -> tuple[int, str] | None:
    """If ``tokens[start]`` begins CAST(expr AS <type>), return (close,
    kind) where kind ∈ {REAL, DECIMAL, other}."""
    if not (
        tokens[start].is_kw("CAST", "TRY_CAST")
        and start + 1 < len(tokens) and tokens[start + 1].text == "("
    ):
        return None
    close = find_matching_paren(tokens, start + 1)
    inner = tokens[start + 2:close]
    depth = 0
    as_idx = None
    for k, tok in enumerate(inner):
        if tok.text == "(":
            depth += 1
        elif tok.text == ")":
            depth -= 1
        elif depth == 0 and tok.is_kw("AS"):
            as_idx = k
    if as_idx is None or as_idx + 1 >= len(inner):
        return close, "other"
    t = inner[as_idx + 1]
    if t.is_kw("REAL"):
        return close, "REAL"
    if t.is_kw("DECIMAL", "DEC", "NUMERIC"):
        return close, "DECIMAL"
    return close, "other"


def _num_tok_info(tokens: list[Tok], i: int):
    """(end, value, is_double) if tokens[i:] starts a numeric literal
    (plain number or REAL/DOUBLE 'x' typed form), else None."""
    t = tokens[i]
    if t.kind == "number":
        txt = t.text.lower()
        return i, float(t.text), ("." in txt or "e" in txt)
    if t.kind == "ident" and t.upper in ("REAL", "DOUBLE") \
            and i + 1 < len(tokens) and tokens[i + 1].kind == "string":
        try:
            return i + 1, float(string_value(tokens[i + 1])), True
        except ValueError:
            return None
    return None


def _pass_ieee_division(tokens: list[Tok]) -> list[Tok]:
    """Two reference `/` semantics Spark lacks, fixed where the operand
    shapes make them visible without a type checker:

    * int-literal / int-literal truncates (LongOperators.divide —
      ``-5/3`` is -1); Spark divides fractionally.  Constant-folded.
    * double-division by a LITERAL zero follows IEEE-754
      (DoubleOperators.divide → ±Infinity / NaN); Spark yields NULL.
      A literal dividend folds to the IEEE constant; a non-literal
      dividend routes through a one-element transform() so it is
      evaluated exactly once (rand()/0.0 in the reference corpus).

    Division with non-literal divisors keeps Spark semantics — the
    documented hold (respelling every division would tax hot paths).
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "/" and i + 1 < n and out:
            rhs = _num_tok_info(tokens, i + 1)
            # lhs literal: a number token, or REAL/DOUBLE 'x' (2 tokens);
            # NOT valid if it is itself the right side of a tighter-or-
            # equal operator (x / 5 / 3 — the 5 is not the dividend)
            lstart = None
            if out[-1].kind == "number":
                lstart = len(out) - 1
            elif out[-1].kind == "string" and len(out) >= 2 \
                    and out[-2].kind == "ident" \
                    and out[-2].upper in ("REAL", "DOUBLE") \
                    and _num_tok_info(out, len(out) - 2) is not None:
                lstart = len(out) - 2
            if lstart is not None and lstart > 0 \
                    and out[lstart - 1].text in ("/", "*", "%"):
                lstart = None
            lhs = _num_tok_info(out, lstart) if lstart is not None else None
            if rhs is not None:
                rend, rval, rdouble = rhs
                if lhs is not None:
                    _, lval, ldouble = lhs
                    if not ldouble and not rdouble and rval != 0:
                        # integer constant fold, truncating toward zero
                        q = abs(int(lval)) // abs(int(rval))
                        if (lval < 0) != (rval < 0):
                            q = -q
                        del out[lstart:]
                        out.append(Tok("number", str(q)))
                        i = rend + 1
                        continue
                    if (ldouble or rdouble) and rval == 0:
                        const = ("NaN" if lval == 0
                                 else "Infinity" if lval > 0
                                 else "-Infinity")
                        del out[lstart:]
                        out += tokenize(f"CAST('{const}' AS DOUBLE)")
                        i = rend + 1
                        continue
                elif rdouble and rval == 0:
                    # non-literal dividend: pop the full multiplicative
                    # chain (a * b / 0.0 divides the product)
                    opnd = _pop_operand(out)
                    while out and out[-1].text in ("/", "*", "%"):
                        o = out.pop()
                        opnd = _pop_operand(out) + [o] + opnd
                    body = render(opnd)
                    out += tokenize(
                        "element_at(transform(array(CAST((" + body + ") "
                        "AS DOUBLE)), __dz -> CASE WHEN __dz IS NULL "
                        "THEN CAST(NULL AS DOUBLE) "
                        "WHEN __dz > 0 THEN CAST('Infinity' AS DOUBLE) "
                        "WHEN __dz < 0 THEN CAST('-Infinity' AS DOUBLE) "
                        "ELSE CAST('NaN' AS DOUBLE) END), 1)")
                    i = rend + 1
                    continue
        out.append(t)
        i += 1
    return out


def _pass_real_decimal_coercion(tokens: list[Tok]) -> list[Tok]:
    """REAL-vs-DECIMAL comparisons coerce the decimal side to REAL.

    Presto's TypeCoercion resolves ``real <cmp> decimal`` to REAL
    (decimal narrows); Spark widens both sides to DOUBLE, where
    ``CAST(1.2 AS REAL) = 1.2`` is FALSE because float(1.2) ≠
    decimal-exact 1.2 under double widening
    (AbstractTestQueries.testJoinWithConstantTrueExpressionWithCoercion,
    issue #7520 in the reference).  Wrapping the decimal operand in
    CAST(… AS REAL) reproduces the reference's resolution.  Detection is
    syntactic — an explicit CAST(… AS REAL) compared against an explicit
    DECIMAL cast or an exact-decimal literal; untyped REAL columns can't
    be recognized without a schema, which matches how the divergence
    shows up in practice (the reference corpus only spells it with
    casts).
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            out += [t] + _pass_real_decimal_coercion(tokens[i + 1:close]) + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    tokens = out
    n = len(tokens)

    def decimal_operand_after(j):
        """(start, end) of a decimal-typed operand starting at j, else None."""
        if j < n and tokens[j].kind == "number" and "." in tokens[j].text \
                and "e" not in tokens[j].text.lower():
            return j, j
        g = _cast_group_kind(tokens, j) if j < n else None
        if g and g[1] == "DECIMAL":
            return j, g[0]
        return None

    res: list[Tok] = []
    i = 0
    while i < n:
        g = _cast_group_kind(tokens, i)
        if g and g[1] == "REAL":
            close = g[0]
            # CAST(… AS REAL) <cmp> <decimal operand>
            if close + 1 < n and tokens[close + 1].text in _CMP_OPS:
                rhs = decimal_operand_after(close + 2)
                if rhs:
                    res += tokens[i:close + 2]
                    res += [ident("CAST"), op("(")] + tokens[rhs[0]:rhs[1] + 1] \
                        + [ident("AS"), ident("REAL"), op(")")]
                    i = rhs[1] + 1
                    continue
            # <decimal operand> <cmp> CAST(… AS REAL): check the tail of res
            if res and res[-1].text in _CMP_OPS:
                # decimal literal directly before the comparison
                if len(res) >= 2 and res[-2].kind == "number" \
                        and "." in res[-2].text and "e" not in res[-2].text.lower():
                    lit_tok = res[-2]
                    res[-2:] = [ident("CAST"), op("("), lit_tok,
                                ident("AS"), ident("REAL"), op(")"), res[-1]]
                # CAST(… AS DECIMAL …) group directly before the comparison
                elif len(res) >= 2 and res[-2].text == ")":
                    depth = 0
                    k = len(res) - 2
                    while k >= 0:
                        if res[k].text == ")":
                            depth += 1
                        elif res[k].text == "(":
                            depth -= 1
                            if depth == 0:
                                break
                        k -= 1
                    start = k - 1
                    if start >= 0 and res[start].is_kw("CAST", "TRY_CAST"):
                        grp = _cast_group_kind(res, start)
                        if grp and grp[1] == "DECIMAL":
                            cmp_tok = res[-1]
                            group = res[start:-1]
                            res[start:] = (
                                [ident("CAST"), op("(")] + group
                                + [ident("AS"), ident("REAL"), op(")"), cmp_tok]
                            )
            res += tokens[i:close + 1]
            i = close + 1
            continue
        res.append(tokens[i])
        i += 1
    return res


def _contains_char_cast(seg: list[Tok]) -> bool:
    return any(
        t.is_kw("AS") and k + 1 < len(seg) and seg[k + 1].is_kw("CHAR")
        for k, t in enumerate(seg))


def _pass_char_semantics(tokens: list[Tok]) -> list[Tok]:
    """CHAR(n)-typed surfaces that vanish once _pass_cast_types lowers
    the casts to rpad/substring:

    * ``=`` with a CHAR-cast operand compares trailing-space-
      insensitively (spi/type/Chars.java padded comparison ≡ rtrim
      both sides);
    * ``typeof`` of a string literal or of a CAST to VARCHAR(n)/CHAR(n)
      reports the parameterized type (TypeOfFunction.java sees the
      analyzed type; Spark's typeof sees plain STRING).
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.kind == "ident" and t.text.lower() == "typeof" \
                and i + 1 < n and tokens[i + 1].text == "(":
            close = find_matching_paren(tokens, i + 1)
            inner = tokens[i + 2:close]
            if len(inner) == 1 and inner[0].kind == "string":
                val = string_value(inner[0])
                out.append(string_literal(f"varchar({len(val)})"))
                i = close + 1
                continue
            if inner and inner[0].is_kw("CAST", "TRY_CAST"):
                m = re.search(
                    r"\bAS\s+(VARCHAR|CHAR)\s*\(\s*(\d+)\s*\)\s*\)$",
                    render(inner), re.I)
                if m:
                    out.append(string_literal(
                        f"{m.group(1).lower()}({m.group(2)})"))
                    i = close + 1
                    continue
        if t.text == "=" and out and i + 1 < n:
            # right operand: literal / typed literal / call group
            j = i + 1
            if tokens[j].kind in ("number", "string"):
                rend = j + 1
            elif tokens[j].kind == "ident" and j + 1 < n \
                    and tokens[j + 1].text == "(":
                rend = find_matching_paren(tokens, j + 1) + 1
            else:
                rend = j + 1
            left = _pop_operand(out)
            right = tokens[j:rend]
            if _contains_char_cast(left) or _contains_char_cast(right):
                out += _splice(
                    "(regexp_replace(__L__, ' +$', '') = "
                    "regexp_replace(__R__, ' +$', ''))",
                    l=_pass_char_semantics(left),
                    r=_pass_char_semantics(right))
                i = rend
                continue
            out += left
        out.append(t)
        i += 1
    return out


def _pass_cast_types(tokens: list[Tok]) -> list[Tok]:
    """Rewrite the type operand of CAST/TRY_CAST from Presto to Spark syntax.

    Runs before _pass_functions so a ROW(...) *type* is never mistaken for
    the ROW(...) *constructor* (which RENAMEs to struct there).
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if (
            t.kind == "ident" and t.upper in ("CAST", "TRY_CAST")
            and i + 1 < n and tokens[i + 1].text == "("
        ):
            close = find_matching_paren(tokens, i + 1)
            inner = tokens[i + 2:close]
            depth = 0
            as_idx = None
            for k, tok in enumerate(inner):
                if tok.text == "(":
                    depth += 1
                elif tok.text == ")":
                    depth -= 1
                elif depth == 0 and tok.is_kw("AS"):
                    as_idx = k
            if as_idx is None:
                out.append(t)
                i += 1
                continue
            value_toks = inner[:as_idx]
            raw_type = _angles_to_parens(inner[as_idx + 1:])
            type_text = _type_text(raw_type)
            if (
                len(raw_type) == 1 and raw_type[0].upper == "JSON"
                and len(value_toks) >= 3
                and value_toks[0].kind == "ident"
                and value_toks[0].upper == "ROW"
                and value_toks[1].text == "("
                and find_matching_paren(value_toks, 1) == len(value_toks) - 1
            ):
                # Presto renders CAST(ROW(…) AS JSON) as a JSON *array*
                # (RowToJsonCast.java), recursively; Spark's to_json
                # renders structs as objects with field names.
                out.extend(_row_as_json(value_toks))
                i = close + 1
                continue
            if (
                len(raw_type) == 1 and raw_type[0].upper == "JSON"
                and len(value_toks) >= 6
                and value_toks[0].is_kw("ARRAY_AGG")
                and value_toks[1].text == "("
                and find_matching_paren(value_toks, 1) == len(value_toks) - 1
                and value_toks[2].kind == "ident"
                and value_toks[2].upper == "ROW"
                and value_toks[3].text == "("
                and find_matching_paren(value_toks, 3) == len(value_toks) - 2
            ):
                # CAST(array_agg(ROW(…)) AS JSON): the element schema is
                # visible syntactically, so each row renders through the
                # same RowToJsonCast rule and the aggregate assembles the
                # JSON array text directly (ArrayToJsonCast.java over
                # array(row(…)) — per-element row-as-array).
                row_json = _pass_cast_types(_row_as_json(value_toks[2:-1]))
                out.extend(
                    _call(
                        "concat", [string_literal("[")],
                        _call(
                            "concat_ws", [string_literal(",")],
                            _call("array_agg", row_json),
                        ),
                        [string_literal("]")],
                    )
                )
                i = close + 1
                continue
            if type_text.upper().startswith(("ARRAY<", "MAP<", "STRUCT<")):
                # JSON → complex casts (JsonToArrayCast/JsonToMapCast/
                # JsonToRowCast): Presto parses the JSON text; Spark's CAST
                # cannot, so the json_parse(x) composition (and bare string
                # literals) route through from_json with the DDL schema.
                # A non-JSON operand (array→array cast etc.) keeps CAST.
                unwrapped = None
                if (
                    len(value_toks) >= 3
                    and value_toks[0].kind == "ident"
                    and value_toks[0].text.lower() == "json_parse"
                    and value_toks[1].text == "("
                    and find_matching_paren(value_toks, 1) == len(value_toks) - 1
                ):
                    unwrapped = value_toks[2:-1]
                elif (
                    # the JSON literal / json_parse forms after the typed-
                    # literal pass: to_json(try_parse_json(X))
                    len(value_toks) >= 6
                    and value_toks[0].kind == "ident"
                    and value_toks[0].text.lower() == "to_json"
                    and value_toks[2].kind == "ident"
                    and value_toks[2].text.lower() == "try_parse_json"
                    and find_matching_paren(value_toks, 1) == len(value_toks) - 1
                ):
                    unwrapped = value_toks[4:-2]
                elif (
                    # CAST(x AS JSON) as the operand: the inner cast
                    # becomes a STRING carrying the JSON text — feed it
                    # to from_json directly
                    len(value_toks) >= 5
                    and value_toks[0].kind == "ident"
                    and value_toks[0].upper in ("CAST", "TRY_CAST")
                    and value_toks[1].text == "("
                    and find_matching_paren(value_toks, 1)
                    == len(value_toks) - 1
                    and value_toks[-2].is_kw("JSON")
                    and value_toks[-3].is_kw("AS")
                ):
                    unwrapped = value_toks
                elif len(value_toks) == 1 and value_toks[0].kind == "string":
                    unwrapped = value_toks
                if unwrapped is not None:
                    tt = type_text.lower()
                    # presto_json_coerce re-tokenizes the JSON text to
                    # the target's token kinds (JsonToArrayCast cross-
                    # token coercion: "12"→12, 12.7→13, numbers→bool);
                    # from_json then parses it losslessly
                    coerced = _call(
                        "presto_json_coerce",
                        _pass_cast_types(unwrapped),
                        [string_literal(render(raw_type).lower())],
                    )
                    fj = _call(
                        "from_json",
                        coerced,
                        [string_literal(tt)],
                    )
                    m_map = re.fullmatch(r"map<(.*)>", tt, re.S)
                    if m_map:
                        # Spark's from_json only parses STRING map keys
                        # (JSON object keys are text); the reference
                        # coerces them to the declared key type
                        # (JsonToMapCast) — parse as string keys, then
                        # transform_keys
                        inner_t = m_map.group(1)
                        d = 0
                        for ci, ch in enumerate(inner_t):
                            if ch == "<":
                                d += 1
                            elif ch == ">":
                                d -= 1
                            elif ch == "," and d == 0:
                                break
                        else:
                            ci = None
                        kt = inner_t[:ci].strip() if ci is not None else ""
                        vt = inner_t[ci + 1:].strip() if ci is not None else ""
                        if kt and kt != "string":
                            fj = _splice(
                                "transform_keys(from_json(__CV__, "
                                f"'map<string,{vt}>'), "
                                f"(__jk, __jv) -> CAST(__jk AS {kt}))",
                                cv=coerced)
                    out.extend(fj)
                    i = close + 1
                    continue
            if len(raw_type) == 1 and raw_type[0].upper == "JSON":
                # generic value → JSON (ArrayToJsonCast/MapToJsonCast/
                # scalar *ToJsonCast): canonical compact text with
                # sorted map keys.  Values that are ALREADY JSON text
                # (json_parse/JSON literal/json_extract output) pass
                # through as the identity cast; everything else renders
                # via the runtime-typed presto_json_field (a formatting
                # corner — row-at-a-time by design, never a scan path).
                head = value_toks[0] if value_toks else None
                already_json = head is not None and head.kind == "ident" \
                    and head.text.lower() in (
                        "json_parse", "to_json", "json_extract",
                        "get_json_object", "json_query", "json_format")
                if not already_json:
                    v = _pass_cast_types(value_toks)
                    # SQL NULL in → SQL NULL out (RETURN_NULL_ON_NULL);
                    # nested nulls still render as JSON 'null' text
                    out.extend(_template_cast_json(v))
                    i = close + 1
                    continue
            m_vc = re.fullmatch(r"(VARCHAR|CHAR)\s*\(\s*(\d+)\s*\)", type_text, re.I)
            if m_vc:
                # Presto CAST(x AS VARCHAR(n)) truncates to n; CHAR(n) also
                # pads (spi/type/Chars.java) — Spark's cast does neither
                n_chars = m_vc.group(2)
                trunc = _call(
                    "substring",
                    [ident("CAST"), op("(")] + _pass_cast_types(value_toks)
                    + [ident("AS"), ident("STRING"), op(")")],
                    [Tok("number", "1")],
                    [Tok("number", n_chars)],
                )
                if m_vc.group(1).upper() == "CHAR":
                    trunc = _call("rpad", trunc, [Tok("number", n_chars)], [string_literal(" ")])
                out.extend(trunc)
                i = close + 1
                continue
            if type_text.upper() == "IPADDRESS":
                # CAST(x AS IPADDRESS) canonicalizes the address text
                # (presto-main/.../type/IpAddressType.java); Spark has no
                # such type — emit the canonicalizing engine UDF, which
                # yields NULL on invalid input (try_cast semantics; the
                # reference raises — documented permissive divergence).
                out.append(ident("presto_ipaddress"))
                out.append(op("("))
                out.extend(_pass_cast_types(inner[:as_idx]))
                out.append(op(")"))
                i = close + 1
                continue
            value_out = _pass_cast_types(inner[:as_idx])
            m_map2 = re.fullmatch(r"MAP<(.*)>", type_text, re.I | re.S)
            if m_map2 and not (len(value_out) == 1
                               and value_out[0].is_kw("NULL")):
                # MAP→MAP casts: the reference coerces keys and values
                # independently (MapToMapCast.java — varchar keys to
                # integer, json-text keys to bigint); Spark's map cast
                # rejects several of those pairs.  Rebuild elementwise —
                # the array casts accept the wider coercion matrix.
                inner_t = m_map2.group(1)
                d = 0
                ci = None
                for cj, ch in enumerate(inner_t):
                    if ch == "<":
                        d += 1
                    elif ch == ">":
                        d -= 1
                    elif ch == "," and d == 0:
                        ci = cj
                        break
                if ci is not None:
                    kt = inner_t[:ci].strip()
                    vt = inner_t[ci + 1:].strip()
                    out += _splice(
                        "(CASE WHEN __V__ IS NULL THEN "
                        f"CAST(NULL AS {type_text}) "
                        "ELSE map_from_arrays("
                        f"CAST(map_keys(__V__) AS ARRAY<{kt}>), "
                        f"CAST(map_values(__V__) AS ARRAY<{vt}>)) END)",
                        v=value_out)
                    i = close + 1
                    continue
            if type_text.upper() in ("BIGINT", "INTEGER", "INT", "SMALLINT",
                                     "TINYINT") \
                    and not (len(value_out) == 1
                             and value_out[0].is_kw("NULL")):
                # Presto CAST(x AS integer-type) ROUNDS to nearest; Spark
                # truncates toward zero.  Dispatch on the runtime type
                # (typeof is constant-folded per column): integer-family
                # and boolean keep the plain cast (identity / 0-1);
                # everything else goes through floor(x + 0.5) in DOUBLE,
                # which is bit-for-bit DoubleOperators.castToLong's
                # Math.round — Spark's own round() diverges on doubles
                # like 12854.49999999 whose shortest decimal repr is .5
                # (BigDecimal.valueOf), and round() does not analyze at
                # all for boolean inputs.  Both branches are BIGINT, so
                # every source type Presto's cast accepts analyzes.
                v = value_out
                value_out = (
                    # __spark_typeof: private alias so the user-facing
                    # typeof() rule (Presto type names via a UDF) never
                    # rewrites this hot-path dispatch
                    [ident("CASE"), ident("WHEN"), ident("__spark_typeof"), op("(")]
                    + v + [op(")"), ident("IN"), op("("),
                           string_literal("tinyint"), op(","),
                           string_literal("smallint"), op(","),
                           string_literal("int"), op(","),
                           # the typeof RULE may rewrite this call to
                           # the Presto spelling before execution
                           string_literal("integer"), op(","),
                           string_literal("bigint"), op(","),
                           string_literal("boolean"), op(")"),
                           ident("THEN"), ident("CAST"), op("(")] + v
                    + [ident("AS"), ident("BIGINT"), op(")"),
                       ident("ELSE"), ident("CAST"), op("(")]
                    + _call("floor",
                            [op("("), ident("CAST"), op("(")] + v
                            + [ident("AS"), ident("DOUBLE"), op(")"),
                               op("+"), Tok("number", "0.5"), op(")")])
                    + [ident("AS"), ident("BIGINT"), op(")"), ident("END")]
                )
            out.append(t)
            out.append(op("("))
            out.extend(value_out)
            out.extend([ident("AS"), ident(type_text), op(")")])
            i = close + 1
            continue
        out.append(t)
        i += 1
    return out


def _pop_operand(out: list[Tok]) -> list[Tok]:
    """Pop the expression immediately left of the cursor off ``out``.

    Handles a parenthesized group / function call (pulling the preceding
    function name unless it is a structural keyword) or a single
    [qualified] identifier / literal.  Shared by the subscript and
    quantified-comparison passes.
    """
    if out[-1].text == ")":
        depth = 0
        k = len(out) - 1
        while k >= 0:
            if out[k].text == ")":
                depth += 1
            elif out[k].text == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        if k > 0 and out[k - 1].kind in ("ident", "qident") \
                and out[k - 1].upper not in _STRUCTURAL_KWS:
            k -= 1
        operand = out[k:]
        del out[k:]
        return operand
    operand = [out.pop()]
    while len(out) >= 2 and out[-1].text == ".":
        if out[-2].kind in ("ident", "qident"):
            operand.insert(0, out.pop())
            operand.insert(0, out.pop())
            continue
        if out[-2].text == ")":
            # field deref on a parenthesized/call result:
            # CAST(... AS row(...)).bb[1]
            operand.insert(0, out.pop())
            depth = 0
            k = len(out) - 1
            while k >= 0:
                if out[k].text == ")":
                    depth += 1
                elif out[k].text == "(":
                    depth -= 1
                    if depth == 0:
                        break
                k -= 1
            if k > 0 and out[k - 1].kind in ("ident", "qident") \
                    and out[k - 1].upper not in _STRUCTURAL_KWS:
                k -= 1
            operand[0:0] = out[k:]
            del out[k:]
            continue
        break
    return operand


def _pass_subscript(tokens: list[Tok]) -> list[Tok]:
    """ARRAY[...] literals and 1-based subscripts.

    ``ARRAY[1,2,3]`` → ``array(1, 2, 3)`` (grammar SqlBase.g4 arrayLiteral);
    ``x[i]`` → ``element_at(x, i)`` — Presto subscripts are 1-based for
    arrays and key-lookups for maps (operator/scalar/SubscriptOperator),
    which is exactly Spark's element_at; Spark's own ``[]`` is 0-based and
    would be silently off by one.

    Documented divergence (permissive vs Presto's strict errors): a missing
    map key or out-of-range array index raises in Presto but yields NULL
    through element_at.  Negative *literal* indexes are rejected here —
    Presto raises "Array subscript is negative" while element_at would
    silently index from the end.  (Negative map-key lookups need the
    explicit element_at(m, k) spelling.)
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "[" and out:
            depth = 1
            j = i + 1
            while j < n and depth:
                if tokens[j].text == "[":
                    depth += 1
                elif tokens[j].text == "]":
                    depth -= 1
                j += 1
            inner = _pass_subscript(tokens[i + 1:j - 1])
            if out[-1].is_kw("ARRAY"):
                out.pop()
                out.extend(_call("array", *split_top_level(inner)))
            else:
                if (len(inner) == 2 and inner[0].text == "-"
                        and inner[1].kind == "number"):
                    raise NotImplementedError(
                        "negative subscript x[-n]: Presto raises 'Array "
                        "subscript is negative'; use element_at(m, k) "
                        "explicitly for negative map keys"
                    )
                operand = _pop_operand(out)
                out.extend(_call("element_at", operand, inner))
            i = j
            continue
        out.append(t)
        i += 1
    return out


_CMP = {"=", "<>", "!=", "<", "<=", ">", ">="}
_ALL_AGG = {">": "max", ">=": "max", "<": "min", "<=": "min"}
_ANY_AGG = {">": "min", ">=": "min", "<": "max", "<=": "max"}


def _agg_sq(select_body: list[Tok], subq: list[Tok], alias: str) -> list[Tok]:
    """(SELECT <body> FROM (<subq>) AS <alias>(__v)) scalar subquery."""
    return ([op("("), ident("SELECT")] + select_body
            + [ident("FROM"), op("(")] + subq
            + [op(")"), ident("AS"), ident(alias),
               op("("), ident("__v"), op(")"), op(")")])


def _pass_quantified(tokens: list[Tok]) -> list[Tok]:
    """ALL/ANY/SOME → min/max scalar subqueries with an empty-set guard.

    Mirrors TransformQuantifiedComparisonApplyToLateralJoin.java, which
    guards the min/max rewrite with count checks: ``x < ALL (empty)`` is
    TRUE and ``x > ANY (empty)`` is FALSE, but the bare scalar-subquery
    comparison would evaluate to NULL on an empty subquery.  NULL elements
    inside a non-empty subquery still diverge (min/max skip them) — same
    simplification the non-count path of the reference rule applies.
    """
    out: list[Tok] = []
    i = 0
    n = 0
    while i < len(tokens):
        t = tokens[i]
        if (
            t.text in _CMP and i + 2 < len(tokens)
            and tokens[i + 1].is_kw("ALL", "ANY", "SOME")
            and tokens[i + 2].text == "("
        ):
            quant = tokens[i + 1].upper
            close = find_matching_paren(tokens, i + 2)
            subq = tokens[i + 2:close + 1]  # includes parens
            subq = _pass_quantified(subq[1:-1])
            n += 1
            if t.text == "=" and quant in ("ANY", "SOME"):
                out.extend([ident("IN"), op("(")] + subq + [op(")")])
            elif t.text in ("<>", "!=") and quant == "ALL":
                out.extend([ident("NOT"), ident("IN"), op("(")] + subq + [op(")")])
            else:
                x = _pop_operand(out)
                count_star = [ident("count"), op("("), op("*"), op(")")]
                minv = [ident("min"), op("("), ident("__v"), op(")")]
                maxv = [ident("max"), op("("), ident("__v"), op(")")]
                if quant == "ALL" and t.text in _ALL_AGG:
                    body = minv if _ALL_AGG[t.text] == "min" else maxv
                    cmp_toks = x + [op(t.text)] + _agg_sq(body, subq, f"__q{n}")
                    empty = "TRUE"
                elif quant in ("ANY", "SOME") and t.text in _ANY_AGG:
                    body = minv if _ANY_AGG[t.text] == "min" else maxv
                    cmp_toks = x + [op(t.text)] + _agg_sq(body, subq, f"__q{n}")
                    empty = "FALSE"
                elif quant == "ALL" and t.text == "=":
                    # x = ALL(s) ⟺ every element equals x ⟺ min = x = max
                    cmp_toks = (x + [op("=")] + _agg_sq(minv, subq, f"__q{n}a")
                                + [ident("AND")]
                                + x + [op("=")] + _agg_sq(maxv, subq, f"__q{n}b"))
                    empty = "TRUE"
                elif quant in ("ANY", "SOME") and t.text in ("<>", "!="):
                    # x <> ANY(s) ⟺ some element differs ⟺ min <> x or max <> x
                    cmp_toks = (x + [op("<>")] + _agg_sq(minv, subq, f"__q{n}a")
                                + [ident("OR")]
                                + x + [op("<>")] + _agg_sq(maxv, subq, f"__q{n}b"))
                    empty = "FALSE"
                else:
                    raise NotImplementedError(
                        f"{t.text} {quant} (subquery) is not supported"
                    )
                out.extend(
                    [op("("), ident("CASE"), ident("WHEN")]
                    + _agg_sq(count_star, subq, f"__q{n}c")
                    + [op("="), Tok("number", "0"), ident("THEN"), ident(empty),
                       ident("ELSE")]
                    + cmp_toks + [ident("END"), op(")")]
                )
            i = close + 1
            continue
        out.append(t)
        i += 1
    return out


def _pass_exists_no_from(tokens: list[Tok]) -> list[Tok]:
    """EXISTS over a FROM-less subquery → plain boolean expression.

    Presto's FROM-less SELECT is a one-row relation, so
    ``EXISTS(SELECT e)`` is TRUE and ``EXISTS(SELECT e WHERE p)`` is
    ``p IS TRUE`` — evaluable without any subquery at all.  The reference
    reaches the same result through TransformExistsApplyToLateralNode's
    count(*) rewrite; folding it at translation time additionally unlocks
    positions Catalyst refuses correlated EXISTS in (projection and
    ORDER BY — e.g. ``ORDER BY EXISTS(SELECT 1 WHERE o.orderkey = 0)``),
    since the emitted expression is just ``coalesce(p, FALSE)``.
    Subqueries with FROM / GROUP BY / HAVING / set operators / LIMIT are
    left for Catalyst's native EXISTS support.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if (
            t.is_kw("EXISTS") and i + 2 < n and tokens[i + 1].text == "("
            and tokens[i + 2].is_kw("SELECT")
        ):
            close = find_matching_paren(tokens, i + 1)
            subq = _pass_exists_no_from(tokens[i + 2:close])
            # depth-0 clause scan of the subquery
            kw_at: dict[str, int] = {}
            depth = 0
            bail = False
            for j, s in enumerate(subq):
                if s.text == "(":
                    depth += 1
                elif s.text == ")":
                    depth -= 1
                elif depth == 0 and s.kind == "ident":
                    u = s.upper
                    if u in ("FROM", "GROUP", "HAVING", "LIMIT", "UNION",
                             "INTERSECT", "EXCEPT"):
                        bail = True
                    elif u == "WHERE":
                        kw_at["WHERE"] = j
            if not bail:
                if "WHERE" in kw_at:
                    pred = subq[kw_at["WHERE"] + 1:]
                    out.extend(
                        _call("coalesce",
                              [op("(")] + pred + [op(")")],
                              [ident("FALSE")])
                    )
                else:
                    out.append(ident("TRUE"))
                i = close + 1
                continue
        out.append(t)
        i += 1
    return out


_AGG_NAMES = {
    "COUNT", "SUM", "AVG", "MIN", "MAX", "ARRAY_AGG", "MAP_AGG", "BOOL_AND",
    "BOOL_OR", "EVERY", "ARBITRARY", "ANY_VALUE", "APPROX_DISTINCT",
    "APPROX_PERCENTILE", "APPROX_SET", "CHECKSUM", "COUNT_IF",
    "GEOMETRIC_MEAN", "MAX_BY", "MIN_BY", "STDDEV", "STDDEV_POP",
    "STDDEV_SAMP", "VARIANCE", "VAR_POP", "VAR_SAMP", "SKEWNESS", "KURTOSIS",
    "CORR", "COVAR_POP", "COVAR_SAMP", "MULTIMAP_AGG", "MAP_UNION",
    "HISTOGRAM", "NUMERIC_HISTOGRAM", "REDUCE_AGG", "SET_AGG", "SET_UNION",
    "BITWISE_AND_AGG", "BITWISE_OR_AGG", "LISTAGG",
}

# a `( SELECT` group right after one of these is a relation / handled
# elsewhere, never a foldable scalar
_NO_FOLD_PREV = ("IN", "FROM", "JOIN", "AS", "EXISTS", "UNION", "INTERSECT",
                 "EXCEPT", "ALL", "ANY", "SOME", "LATERAL", "TABLE")


def _pass_collapse_trivial_derived(tokens: list[Tok]) -> list[Tok]:
    """``SELECT * FROM (SELECT <items>) [alias]`` with a FROM-less inner
    select → ``SELECT <items>``.

    The reference plans these "subrelation" wrappers around correlated
    scalars (AbstractTestQueries testCorrelatedScalarSubqueriesWith
    ScalarAggregation's subrelation cases) through decorrelation; Spark
    cannot resolve a correlation through the extra derived level.  The
    wrapper adds nothing — no filter, no projection change — so peeling
    it restores the one-level shape `_pass_scalar_no_from` / Catalyst
    handle.  Applied only to the exact bare shape (outer list is ``*``,
    no trailing clauses, inner has no FROM at depth 0).
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            out += [t] + _pass_collapse_trivial_derived(tokens[i + 1:close]) + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    tokens = out
    n = len(tokens)
    if not (
        n >= 5 and tokens[0].is_kw("SELECT") and tokens[1].text == "*"
        and tokens[2].is_kw("FROM") and tokens[3].text == "("
    ):
        return tokens
    close = find_matching_paren(tokens, 3)
    rest = tokens[close + 1:]
    # optional bare alias ([AS] ident), nothing else after
    if rest and rest[0].is_kw("AS"):
        rest = rest[1:]
    if rest and rest[0].kind in ("ident", "qident") and not rest[0].is_kw(
        "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "UNION", "INTERSECT",
        "EXCEPT", "JOIN", "CROSS", "INNER", "LEFT", "RIGHT", "FULL",
    ):
        rest = rest[1:]
    if rest:
        return tokens
    inner = tokens[4:close]
    if not inner or not inner[0].is_kw("SELECT"):
        return tokens
    depth = 0
    for s in inner:
        if s.text == "(":
            depth += 1
        elif s.text == ")":
            depth -= 1
        elif depth == 0 and s.is_kw("FROM", "UNION", "INTERSECT", "EXCEPT"):
            return tokens
    return inner


def _pass_scalar_no_from(tokens: list[Tok], clause: str = "init") -> list[Tok]:
    """Correlated scalar subqueries over FROM-less bodies → expressions.

    Presto plans ``(SELECT e)`` / ``(SELECT e WHERE p)`` (one-row
    relation, possibly referencing outer columns) through its Apply
    decorrelation rules; Catalyst rejects most of these shapes
    (non-aggregated correlated scalars, correlation in join conditions,
    ORDER BY position).  But FROM-less bodies need no subquery at all:

    - ``(SELECT e)``                → ``(e)``
    - ``(SELECT e WHERE p)``        → ``CASE WHEN coalesce(p, FALSE)
                                        THEN e ELSE NULL END``
    - ``(SELECT count(*) WHERE p)`` → ``CASE … THEN 1 ELSE 0 END``
      (count over the 0/1-row relation; count(e) also checks e IS NOT
      NULL; min/max are identity on one row)

    Other aggregates (sum/avg re-type their argument) and bodies with
    FROM / GROUP BY / set ops are left for Catalyst.  Clause tracking
    keeps relation positions (FROM lists, set-op operands, WITH bodies)
    untouched.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.kind == "ident":
            u = t.upper
            if u == "SELECT":
                clause = "select"
            elif u in ("FROM", "JOIN"):
                clause = "from"
            elif u in ("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "ON",
                       "USING"):
                clause = "expr"
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            inner = tokens[i + 1:close]
            starts_select = bool(inner) and inner[0].is_kw("SELECT")
            prev_blocks = bool(out) and out[-1].is_kw(*_NO_FOLD_PREV)
            nxt = tokens[close + 1] if close + 1 < n else None
            nxt_setop = nxt is not None and nxt.is_kw(
                "UNION", "INTERSECT", "EXCEPT"
            )
            inner_done = _pass_scalar_no_from(
                inner, "init" if starts_select else clause
            )
            folded: list[Tok] | None = None
            if (starts_select and clause in ("select", "expr")
                    and not prev_blocks and not nxt_setop):
                folded = _try_fold_scalar(inner_done)
            if folded is not None:
                out.extend(folded)
            else:
                out += [t] + inner_done + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    return out


def _try_fold_scalar(body: list[Tok]) -> list[Tok] | None:
    """Fold ``SELECT <expr> [WHERE <pred>]`` tokens to an expression, or
    None if the body is not a qualifying FROM-less single-item select."""
    depth = 0
    where_at = None
    for j, s in enumerate(body):
        if s.text == "(":
            depth += 1
        elif s.text == ")":
            depth -= 1
        elif depth == 0:
            if s.text == "," or s.is_kw(
                "FROM", "GROUP", "HAVING", "ORDER", "LIMIT", "UNION",
                "INTERSECT", "EXCEPT", "AS", "DISTINCT",
            ):
                return None
            if s.is_kw("WHERE") and where_at is None:
                where_at = j
    expr = body[1:where_at] if where_at is not None else body[1:]
    pred = body[where_at + 1:] if where_at is not None else None
    if not expr:
        return None

    def agg_call(toks: list[Tok]) -> str | None:
        d = 0
        for j, s in enumerate(toks):
            if s.text == "(":
                d += 1
            elif s.text == ")":
                d -= 1
            elif d == 0 and s.kind == "ident" and s.upper in _AGG_NAMES \
                    and j + 1 < len(toks) and toks[j + 1].text == "(":
                return s.upper
        return None

    agg = agg_call(expr)
    cond = (
        _call("coalesce", [op("(")] + pred + [op(")")], [ident("FALSE")])
        if pred is not None else [ident("TRUE")]
    )
    one = [ident("CAST"), op("("), Tok("number", "1"), ident("AS"),
           ident("BIGINT"), op(")")]
    zero = [ident("CAST"), op("("), Tok("number", "0"), ident("AS"),
            ident("BIGINT"), op(")")]
    if agg is None:
        if pred is None:
            return [op("(")] + expr + [op(")")]
        return ([op("("), ident("CASE"), ident("WHEN")] + cond
                + [ident("THEN")] + expr
                + [ident("ELSE"), ident("NULL"), ident("END"), op(")")])
    # whole expression must be exactly one aggregate call: agg ( ... )
    if not (expr[0].kind == "ident" and expr[0].upper == agg
            and len(expr) >= 3 and expr[1].text == "("
            and find_matching_paren(expr, 1) == len(expr) - 1):
        return None
    arg = expr[2:-1]
    if agg == "COUNT":
        if len(arg) == 1 and (arg[0].text == "*" or arg[0].kind in
                              ("number", "string")):
            return ([op("("), ident("CASE"), ident("WHEN")] + cond
                    + [ident("THEN")] + one + [ident("ELSE")] + zero
                    + [ident("END"), op(")")])
        if agg_call(arg) is None and arg and not arg[0].is_kw("DISTINCT"):
            return ([op("("), ident("CASE"), ident("WHEN")] + cond
                    + [ident("AND"), op("(")] + arg + [op(")"),
                       ident("IS"), ident("NOT"), ident("NULL"),
                       ident("THEN")] + one + [ident("ELSE")] + zero
                    + [ident("END"), op(")")])
        return None
    if agg in ("MIN", "MAX") and agg_call(arg) is None and arg \
            and not arg[0].is_kw("DISTINCT"):
        # identity over the 0/1-row relation
        if pred is None:
            return [op("(")] + arg + [op(")")]
        return ([op("("), ident("CASE"), ident("WHEN")] + cond
                + [ident("THEN")] + arg
                + [ident("ELSE"), ident("NULL"), ident("END"), op(")")])
    return None


_IN_NULL_BOOL = [ident("CAST"), op("("), ident("NULL"), ident("AS"),
                 ident("BOOLEAN"), op(")")]


def _is_query(toks: list[Tok]) -> bool:
    """Is this paren body a query expression (SELECT/WITH, possibly a
    parenthesized set-operation chain like ``(SELECT 1) UNION ALL …``)?"""
    if not toks:
        return False
    if toks[0].is_kw("SELECT", "WITH"):
        return True
    if toks[0].text == "(":
        close = find_matching_paren(toks, 0)
        if close == len(toks) - 1:
            return _is_query(toks[1:close])
        nxt = toks[close + 1] if close + 1 < len(toks) else None
        return nxt is not None and nxt.is_kw("UNION", "INTERSECT", "EXCEPT")
    return False


def _count_sq(subq: list[Tok], alias: str, where: list[Tok] | None) -> list[Tok]:
    """``(SELECT count(*) FROM (<subq>) <alias>[(__v)] [WHERE <where>])``."""
    toks = ([op("("), ident("SELECT"), ident("count"), op("("), op("*"),
             op(")"), ident("FROM"), op("(")] + list(subq) + [op(")"),
            ident(alias)])
    if where is not None:
        toks += [op("("), ident("__v"), op(")"), ident("WHERE")] + where
    toks.append(op(")"))
    return toks


_JOIN_KWS = ("JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "NATURAL")
_CLAUSE_KWS = ("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "WINDOW")
_SETOP_KWS = ("UNION", "INTERSECT", "EXCEPT")


def _has_subquery(toks: list[Tok]) -> bool:
    return any(
        t.text == "(" and j + 1 < len(toks)
        and toks[j + 1].is_kw("SELECT", "WITH")
        for j, t in enumerate(toks)
    )


def _skip_parens(tokens: list[Tok], j: int) -> int:
    """Index after token j, jumping over a paren group if j opens one."""
    if tokens[j].text == "(":
        return find_matching_paren(tokens, j) + 1
    return j + 1


def _pass_join_on_subquery(tokens: list[Tok]) -> list[Tok]:
    """Inner-join ON conditions containing subqueries → CROSS JOIN + WHERE.

    Presto decorrelates subqueries in inner-join criteria through its
    Apply rules (TransformCorrelatedScalarAggregationToJoin et al. run
    after the criteria land in a filter); Catalyst rejects any subquery
    inside a join condition outright.  For INNER joins the ON predicate
    is equivalent to a WHERE conjunct, so hoisting it restores Catalyst's
    native subquery planning (scalar/EXISTS/IN in WHERE position).  The
    reference itself rejects the outer-join form
    (testCorrelatedScalarSubqueriesWithScalarAggregation: "Correlated
    subquery in given context is not supported"), so only plain/INNER
    JOIN is rewritten.  Equi-conditions hoisted this way are recovered
    as join criteria by Catalyst's cross-join elimination, so plans for
    ordinary joins are unchanged — the rewrite only fires when the ON
    clause contains a subquery.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            out += [t] + _pass_join_on_subquery(tokens[i + 1:close]) + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    tokens = out
    while True:
        rewritten = _rewrite_one_join_on(tokens)
        if rewritten is None:
            return tokens
        tokens = rewritten


def _rewrite_one_join_on(tokens: list[Tok]) -> list[Tok] | None:
    n = len(tokens)
    i = 0
    while i < n:
        t = tokens[i]
        if t.text == "(":
            i = find_matching_paren(tokens, i) + 1
            continue
        if not t.is_kw("JOIN"):
            i += 1
            continue
        prev = tokens[i - 1] if i else None
        if prev is not None and prev.is_kw(
            "LEFT", "RIGHT", "FULL", "CROSS", "NATURAL", "OUTER", "SEMI", "ANTI"
        ):
            i += 1
            continue
        # locate this join's ON keyword
        j, on_idx = i + 1, None
        while j < n:
            s = tokens[j]
            if s.text == "(":
                j = find_matching_paren(tokens, j) + 1
                continue
            if s.is_kw("ON"):
                on_idx = j
                break
            if s.is_kw(*_JOIN_KWS, *_CLAUSE_KWS, *_SETOP_KWS) or s.text in (",", ";"):
                break
            j += 1
        if on_idx is None:
            i += 1
            continue
        j = on_idx + 1
        while j < n:
            s = tokens[j]
            if s.text == "(":
                j = find_matching_paren(tokens, j) + 1
                continue
            if (s.is_kw(*_JOIN_KWS, *_CLAUSE_KWS, *_SETOP_KWS, "ON", "USING")
                    or s.text in (",", ";")):
                break
            j += 1
        cond_end = j
        # A second ON/USING right after this condition means this join is
        # the right operand of an enclosing join tree written without
        # parens (``a LEFT JOIN b JOIN c ON p ON q``).  Hoisting p to
        # WHERE would cross the enclosing (possibly outer) join, so the
        # rewrite is unsound there — leave the tree alone.
        if cond_end < n and tokens[cond_end].is_kw("ON", "USING"):
            i = cond_end + 1
            continue
        cond = tokens[on_idx + 1:cond_end]
        if not _has_subquery(cond):
            i = cond_end
            continue
        join_start = i - 1 if (prev is not None and prev.is_kw("INNER")) else i
        head = (
            tokens[:join_start] + [ident("CROSS"), ident("JOIN")]
            + tokens[i + 1:on_idx]
        )
        tail = tokens[cond_end:]
        return head + _conjoin_where(tail, cond)
    return None


def _conjoin_where(tail: list[Tok], cond: list[Tok]) -> list[Tok]:
    """AND ``cond`` into the (possibly absent) WHERE clause at the head
    of ``tail``, staying within the current query block."""
    m = len(tail)
    j = 0
    where_idx = None
    insert_at = m
    while j < m:
        s = tail[j]
        if s.text == "(":
            j = find_matching_paren(tail, j) + 1
            continue
        if s.is_kw("WHERE"):
            where_idx = j
            break
        if s.is_kw(*_CLAUSE_KWS, *_SETOP_KWS) or s.text == ";":
            insert_at = j
            break
        j += 1
    wrapped = [op("(")] + cond + [op(")")]
    if where_idx is None:
        return (
            tail[:insert_at] + [ident("WHERE")] + wrapped + tail[insert_at:]
        )
    j = where_idx + 1
    while j < m:
        s = tail[j]
        if s.text == "(":
            j = find_matching_paren(tail, j) + 1
            continue
        if s.is_kw(*_CLAUSE_KWS, *_SETOP_KWS) or s.text == ";":
            break
        j += 1
    old = tail[where_idx + 1:j]
    return (
        tail[:where_idx] + [ident("WHERE")] + wrapped + [ident("AND"),
        op("(")] + old + [op(")")] + tail[j:]
    )


def _pass_hoist_grouped_csq(tokens: list[Tok], _ctr: list[int] | None = None) -> list[Tok]:
    """Correlated scalar subqueries in grouped SELECT / GROUP BY position
    → computed pre-aggregation in a derived table.

    Presto plans ``SELECT agg(x), k, (SELECT … o.k …) FROM t o GROUP BY k``
    and ``GROUP BY k, (SELECT … o.k …)`` through
    TransformCorrelatedScalarAggregationToJoin; Catalyst refuses
    correlated scalar subqueries mixed with outer aggregation or used as
    grouping keys.  Since the reference's analyzer only admits these when
    the subquery's outer references are group keys, hoisting is sound:

        SELECT max(o.d), o.k, (SELECT … o.k …) FROM t o [WHERE w] GROUP BY o.k
        → SELECT max(o.d), o.k, __csq1
          FROM (SELECT o.*, (SELECT … o.k …) AS __csq1 FROM t o [WHERE w]) AS o
          GROUP BY o.k, __csq1

    Scope guard: single-relation FROM (table/CTE with optional alias),
    plain GROUP BY list, subquery correlation detected as an
    ``alias.``-qualified reference.  Everything else is left to Catalyst.
    """
    if _ctr is None:
        _ctr = [0]
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            out += [t] + _pass_hoist_grouped_csq(tokens[i + 1:close], _ctr) + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    return _hoist_one_block(out, _ctr)


def _hoist_one_block(tokens: list[Tok], _ctr: list[int]) -> list[Tok]:
    n = len(tokens)
    # depth-0 clause map (first occurrence after the main SELECT)
    idx: dict[str, int] = {}
    j = 0
    while j < n:
        s = tokens[j]
        if s.text == "(":
            j = find_matching_paren(tokens, j) + 1
            continue
        u = s.upper if s.kind == "ident" else None
        if u in ("SELECT", "FROM", "WHERE", "GROUP", "HAVING", "ORDER",
                 "LIMIT") and u not in idx:
            idx[u] = j
        if u in _SETOP_KWS:
            return tokens  # set-op chain: leave to Catalyst
        j += 1
    if "SELECT" not in idx or "FROM" not in idx or "GROUP" not in idx:
        return tokens
    sel_i, from_i, group_i = idx["SELECT"], idx["FROM"], idx["GROUP"]
    if not (sel_i < from_i < group_i):
        return tokens
    where_i = idx.get("WHERE")
    if where_i is not None and not (from_i < where_i < group_i):
        return tokens
    from_end = where_i if where_i is not None else group_i
    from_seg = tokens[from_i + 1:from_end]
    alias = _single_relation_alias(from_seg)
    if alias is None:
        return tokens
    group_end = min(
        [v for k, v in idx.items() if k in ("HAVING", "ORDER", "LIMIT")]
        or [n]
    )
    group_seg = tokens[group_i + 2:group_end]
    if tokens[group_i + 1].upper != "BY" or not group_seg or group_seg[0].is_kw(
        "GROUPING", "CUBE", "ROLLUP"
    ):
        return tokens
    select_seg = tokens[sel_i + 1:from_i]

    hoisted: dict[str, tuple[str, list[Tok]]] = {}  # rendered → (var, toks)

    def replace(seg: list[Tok], in_group: bool) -> tuple[list[Tok], list[str], list[str]]:
        res: list[Tok] = []
        plain_vars: list[str] = []  # bare (non-agg-arg) SELECT occurrences
        group_vars: list[str] = []
        k = 0
        agg_depth_stack: list[int] = []
        depth = 0
        while k < len(seg):
            s = seg[k]
            if s.text == "(" and k + 1 < len(seg) and seg[k + 1].is_kw("SELECT", "WITH"):
                close = find_matching_paren(seg, k)
                sub = seg[k + 1:close]
                # only *scalar* subqueries hoist; EXISTS(…)/IN(…) operand
                # subqueries are predicate arguments Catalyst plans natively
                is_scalar = not (
                    res and res[-1].is_kw("EXISTS", "IN", "ALL", "ANY", "SOME")
                )
                if is_scalar and _is_correlated(sub, alias):
                    key = render(sub)
                    if key not in hoisted:
                        _ctr[0] += 1
                        hoisted[key] = (f"__csq{_ctr[0]}", sub)
                    var = hoisted[key][0]
                    res.append(ident(var))
                    if in_group:
                        group_vars.append(var)
                    elif not agg_depth_stack:
                        plain_vars.append(var)
                    k = close + 1
                    continue
                res += seg[k:close + 1]
                k = close + 1
                continue
            if s.text == "(":
                if res and res[-1].kind == "ident" and res[-1].upper in _AGG_NAMES:
                    agg_depth_stack.append(depth)
                depth += 1
            elif s.text == ")":
                depth -= 1
                if agg_depth_stack and agg_depth_stack[-1] == depth:
                    agg_depth_stack.pop()
            res.append(s)
            k += 1
        return res, plain_vars, group_vars

    new_select, plain_vars, _ = replace(select_seg, in_group=False)
    new_group, _, group_vars = replace(group_seg, in_group=True)
    if not hoisted:
        return tokens
    derived: list[Tok] = [
        op("("), ident("SELECT"), ident(alias), op("."), op("*"),
    ]
    for var, sub in hoisted.values():
        derived += [op(","), op("(")] + sub + [op(")"), ident("AS"), ident(var)]
    derived += [ident("FROM")] + from_seg
    if where_i is not None:
        derived += [ident("WHERE")] + tokens[where_i + 1:group_i]
    derived += [op(")"), ident("AS"), ident(alias)]
    extra = [v for v in plain_vars if v not in group_vars]
    group_suffix: list[Tok] = []
    for v in dict.fromkeys(extra):
        group_suffix += [op(","), ident(v)]
    return (
        tokens[:sel_i] + [ident("SELECT")] + new_select
        + [ident("FROM")] + derived
        + [ident("GROUP"), ident("BY")] + new_group + group_suffix
        + tokens[group_end:]
    )


def _single_relation_alias(from_seg: list[Tok]) -> str | None:
    """Alias of a single-relation FROM (``t``, ``s.t``, ``t a``,
    ``t AS a``), or None if the FROM is anything more complex."""
    toks = [t for t in from_seg if not t.is_kw("AS")]
    if not toks or any(
        t.kind not in ("ident", "qident") and t.text != "." for t in toks
    ):
        return None
    if any(t.is_kw(*_JOIN_KWS, "UNNEST", "LATERAL", "TABLESAMPLE")
           or t.text == "," for t in toks):
        return None
    # trailing ident not preceded by a dot = alias; else last name part
    if len(toks) >= 2 and toks[-1].kind == "ident" and toks[-2].text != ".":
        return toks[-1].text
    if toks[-1].kind in ("ident", "qident"):
        return toks[-1].text.strip('"')
    return None


def _is_correlated(sub: list[Tok], alias: str) -> bool:
    up = alias.upper()
    return any(
        t.kind == "ident" and t.upper == up
        and j + 1 < len(sub) and sub[j + 1].text == "."
        for j, t in enumerate(sub)
    )


def _trailing_relation_alias(seg: list[Tok]) -> str | None:
    """Visible alias (or bare table name) of a relation reference: the
    trailing identifier of ``t`` / ``s.t`` / ``t a`` / ``t AS a`` /
    ``(subq) a``."""
    seg = [t for t in seg if not t.is_kw("AS")]
    if not seg:
        return None
    last = seg[-1]
    if last.kind in ("ident", "qident"):
        return last.text.strip('"')
    return None


def _using_join_aliases(tokens: list[Tok], using_pos: int) -> set[str]:
    """Aliases of the relations that are operands of the join tree
    containing the USING clause at ``using_pos`` — i.e. the
    comma-delimited FROM segment the USING belongs to.  Relations in
    other FROM segments (``…USING (k), z c``) are NOT operands of the
    USING join, and their qualified stars keep all columns in the
    reference (StatementAnalyzer USING scope is per-join)."""
    n = len(tokens)
    from_idx = None
    j = 0
    while j < n:
        s = tokens[j]
        if s.text == "(":
            j = find_matching_paren(tokens, j) + 1
            continue
        if s.is_kw("FROM") and j < using_pos:
            from_idx = j
        if s.is_kw(*_CLAUSE_KWS, *_SETOP_KWS) and j > using_pos:
            break
        j += 1
    if from_idx is None:
        return set()
    end = j if j <= n else n
    # split the FROM clause on depth-0 commas; keep the segment holding USING
    seg_start = from_idx + 1
    seg: list[Tok] | None = None
    k = seg_start
    while k <= end:
        if k == end or tokens[k].text == ",":
            if seg_start <= using_pos < k:
                seg = tokens[seg_start:k]
                break
            seg_start = k + 1
            k += 1
            continue
        if tokens[k].text == "(":
            k = find_matching_paren(tokens, k) + 1
            continue
        k += 1
    if seg is None:
        return set()
    # split the segment on depth-0 JOIN keywords → relation operands
    aliases: set[str] = set()
    piece: list[Tok] = []
    pieces: list[list[Tok]] = []
    k = 0
    while k < len(seg):
        t = seg[k]
        if t.text == "(":
            close = find_matching_paren(seg, k)
            piece += seg[k:close + 1]
            k = close + 1
            continue
        if t.is_kw("JOIN"):
            pieces.append(piece)
            piece = []
            k += 1
            continue
        piece.append(t)
        k += 1
    pieces.append(piece)
    for p in pieces:
        while p and p[-1].is_kw("INNER", "LEFT", "RIGHT", "FULL", "OUTER",
                                "CROSS", "NATURAL", "SEMI", "ANTI"):
            p = p[:-1]
        for m, t in enumerate(p):
            if t.is_kw("ON") or t.is_kw("USING"):
                p = p[:m]
                break
        a = _trailing_relation_alias(p)
        if a:
            aliases.add(a.upper())
    return aliases


def _pass_using_wildcard(tokens: list[Tok]) -> list[Tok]:
    """Qualified wildcards after a USING join exclude the join columns.

    ``SELECT a.*, b.* FROM x a JOIN y b USING (k)`` yields ``a.partkey,
    b.custkey`` in the reference (StatementAnalyzer USING scope: the
    common columns belong to neither side's qualified star), while Spark
    keeps them in both stars.  Rewrite ``alias.*`` → ``alias.* EXCEPT
    (k, …)`` (Spark 3.4+ star-except).  Applied only when the block has
    exactly one depth-0 USING clause — with several, the per-alias
    column ownership isn't known syntactically.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            out += [t] + _pass_using_wildcard(tokens[i + 1:close]) + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    tokens = out
    using_cols: list[list[Tok]] | None = None
    using_pos = -1
    n = len(tokens)
    j = 0
    count = 0
    while j < n:
        s = tokens[j]
        if s.text == "(":
            j = find_matching_paren(tokens, j) + 1
            continue
        if s.is_kw("USING") and j + 1 < n and tokens[j + 1].text == "(":
            close = find_matching_paren(tokens, j + 1)
            using_cols = split_top_level(tokens[j + 2:close])
            using_pos = j
            count += 1
            j = close + 1
            continue
        j += 1
    if count != 1 or not using_cols:
        return tokens
    join_aliases = _using_join_aliases(tokens, using_pos)
    if not join_aliases:
        return tokens
    # rewrite alias.* in the depth-0 SELECT list
    res: list[Tok] = []
    j = 0
    clause = "init"
    while j < n:
        s = tokens[j]
        if s.kind == "ident":
            u = s.upper
            if u == "SELECT":
                clause = "select"
            elif u == "FROM":
                clause = "other"
        if s.text == "(":
            close = find_matching_paren(tokens, j)
            res += tokens[j:close + 1]
            j = close + 1
            continue
        if (
            clause == "select" and s.text == "."
            and j + 1 < n and tokens[j + 1].text == "*"
            and res and res[-1].kind in ("ident", "qident")
            and res[-1].text.strip('"').upper() in join_aliases
        ):
            res += [s, tokens[j + 1], ident("EXCEPT"), op("(")]
            for k, c in enumerate(using_cols):
                if k:
                    res.append(op(","))
                res += c
            res.append(op(")"))
            j += 2
            continue
        res.append(s)
        j += 1
    return res


def _pass_projected_in(tokens: list[Tok], clause: str = "other",
                       _ctr: list[int] | None = None) -> list[Tok]:
    """Three-valued ``x [NOT] IN (subquery)`` in output position.

    In WHERE/HAVING position Spark's null-aware semi join matches Presto
    exactly (a NULL verdict drops the row either way).  But *projected*
    IN-subqueries are planned as ExistenceJoin, which collapses NULL to
    FALSE — Presto (SemiJoinOperator / LookupSymbolResolver) keeps the
    SQL three-valued result: NULL when the lhs is NULL and the subquery
    is non-empty, or when no element matches but a NULL element exists.

    Rewrite (projection and ORDER BY context only):

        CASE WHEN (SELECT count(*) FROM (subq) a) = 0          THEN FALSE
             WHEN x IS NULL                                    THEN NULL
             WHEN (SELECT count(*) FROM (subq) b(__v)
                   WHERE __v = x) > 0                          THEN TRUE
             WHEN (SELECT count(*) FROM (subq) c(__v)
                   WHERE __v IS NULL) > 0                      THEN NULL
             ELSE FALSE END

    All three scalar subqueries decorrelate (equality-only correlation
    added outside the derived table; any pre-existing correlation stays
    inside it), so the plan is still joins + aggregates — the same shape
    the reference's TransformUncorrelatedInPredicateSubqueryToSemiJoin
    family produces, with the null-test legs its semi-join operator
    evaluates inline.  NOT IN wraps the CASE in NOT (three-valued).

    Two guards keep the rewrite out of positions it would break:
    aggregate-call arguments (scalar subqueries inside agg functions mix
    outer/local references), and any block with a depth-0 GROUP BY —
    there a projected IN must stay *textually identical* to its GROUP BY
    twin (testSemiJoin#17 groups by the same IN expression it projects),
    so those keep Catalyst's native ExistenceJoin planning.
    """
    if _ctr is None:
        _ctr = [0]
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    depth0_group = False
    d = 0
    for s in tokens:
        if s.text == "(":
            d += 1
        elif s.text == ")":
            d -= 1
        elif d == 0 and s.is_kw("GROUP"):
            depth0_group = True
    while i < n:
        t = tokens[i]
        if t.kind == "ident":
            u = t.upper
            if u == "SELECT":
                clause = "select"
            elif u in ("FROM", "WHERE", "GROUP", "HAVING", "LIMIT", "ON",
                       "ORDER"):
                # ORDER BY keeps Catalyst's native IN planning: a
                # correlated scalar subquery (the rewrite's match leg) is
                # not allowed in sort expressions, and the reference's own
                # corpus only exercises null-edge INs in the SELECT list.
                clause = "other"
        if (
            clause == "select" and not depth0_group
            and t.is_kw("IN") and i + 2 < n
            and tokens[i + 1].text == "("
            and _is_query(tokens[i + 2:find_matching_paren(tokens, i + 1)])
        ):
            close = find_matching_paren(tokens, i + 1)
            subq = _pass_projected_in(tokens[i + 2:close], "other", _ctr)
            negate = bool(out) and out[-1].is_kw("NOT")
            if negate:
                out.pop()
            lhs = [op("(")] + _pop_operand(out) + [op(")")]
            _ctr[0] += 1
            k = _ctr[0]
            case = (
                [ident("CASE"),
                 ident("WHEN")] + _count_sq(subq, f"__pin{k}a", None)
                + [op("="), Tok("number", "0"), ident("THEN"), ident("FALSE"),
                   ident("WHEN")] + lhs + [ident("IS"), ident("NULL"),
                   ident("THEN")] + _IN_NULL_BOOL
                + [ident("WHEN")] + _count_sq(
                    subq, f"__pin{k}b", [ident("__v"), op("=")] + lhs)
                + [op(">"), Tok("number", "0"), ident("THEN"), ident("TRUE"),
                   ident("WHEN")] + _count_sq(
                    subq, f"__pin{k}c",
                    [ident("__v"), ident("IS"), ident("NULL")])
                + [op(">"), Tok("number", "0"), ident("THEN")] + _IN_NULL_BOOL
                + [ident("ELSE"), ident("FALSE"), ident("END")]
            )
            if negate:
                out += [op("("), ident("NOT"), op("(")] + case + [op(")"), op(")")]
            else:
                out += [op("(")] + case + [op(")")]
            i = close + 1
            continue
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            inner = tokens[i + 1:close]
            if _is_query(inner) or (
                out and out[-1].kind == "ident"
                and out[-1].upper in _AGG_NAMES
            ):
                sub_clause = "other"
            else:
                sub_clause = clause
            out += [t] + _pass_projected_in(inner, sub_clause, _ctr) + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    return out


def _pass_functions(tokens: list[Tok]) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if (
            t.kind in ("ident", "qident") and i + 1 < len(tokens)
            and tokens[i + 1].text == "("
        ):
            close = find_matching_paren(tokens, i + 1)
            inner = tokens[i + 2:close]
            # quoted function names resolve like bare ones — the
            # reference's hidden aggregates are only reachable quoted
            # ("$internal$sum_data_size_for_stats"(x), SqlBase.g4
            # quotedIdentifier in qualifiedName position)
            name = (t.text.lower() if t.kind == "ident"
                    else t.text[1:-1].replace('""', '"').lower())
            if inner:
                args = [_pass_functions(a) for a in split_top_level(inner)]
            else:
                args = []
            if name in RULES and (t.kind == "qident"
                                  or not _looks_like_keyword_use(t)):
                body = RULES[name](args)  # type: ignore[operator]
                # aggregate FILTER clause (SqlBase.g4 filter): when the
                # rewrite buried the aggregate inside an expression
                # (array_agg ORDER BY → transform(sort_array(
                # collect_list(…)))…), a trailing FILTER must attach to
                # the inner collect_list, not the outer scalar — splice
                # it there when the rewrite holds exactly one
                nxt = close + 1
                if (nxt + 1 < len(tokens) and tokens[nxt].is_kw("FILTER")
                        and tokens[nxt + 1].text == "("):
                    fclose = find_matching_paren(tokens, nxt + 1)
                    # paren groups holding their own SELECT are
                    # subqueries riding along in the arguments — their
                    # aggregates must not receive the outer mask
                    sub_spans = []
                    sj = 0
                    while sj < len(body):
                        if body[sj].text == "(":
                            sclose = find_matching_paren(body, sj)
                            if any(x.is_kw("SELECT")
                                   for x in body[sj + 1:sclose]):
                                sub_spans.append((sj, sclose))
                                sj = sclose + 1
                                continue
                        sj += 1
                    cl_sites = [k for k, b in enumerate(body)
                                if b.kind == "ident"
                                and b.text == "collect_list"
                                and k + 1 < len(body)
                                and body[k + 1].text == "("
                                and not any(s < k < e
                                            for s, e in sub_spans)]
                    if cl_sites and not (
                            body[0].kind == "ident"
                            and body[0].text == "collect_list"):
                        # several sites = the SAME logical collection
                        # referenced more than once (map_agg/histogram
                        # repeat their entries array) — the mask applies
                        # to each; splice back-to-front so spans hold
                        suffix = _pass_functions(tokens[nxt:fclose + 1])
                        for site in reversed(cl_sites):
                            cl_end = find_matching_paren(body, site + 1)
                            body = (body[:cl_end + 1] + suffix
                                    + body[cl_end + 1:])
                        close = fclose
                out.extend(body)
            elif name in RENAME:
                out.extend(_call(RENAME[name], *args))
            else:
                out.append(t)
                out.append(op("("))
                for k, a in enumerate(args):
                    if k:
                        out.append(op(","))
                    out.extend(a)
                out.append(op(")"))
            i = close + 1
            continue
        out.append(t)
        i += 1
    return out


_STRUCTURAL_KWS = {"IN", "EXISTS", "OVER", "VALUES", "AND", "OR", "NOT",
                   "WHERE", "ON", "FROM", "SELECT", "AS", "BY", "WHEN",
                   "THEN", "ELSE", "CASE", "END", "HAVING", "JOIN", "USING",
                   "DISTINCT", "ALL", "UNION", "EXCEPT", "INTERSECT"}


def _looks_like_keyword_use(tok: Tok) -> bool:
    # `contains` never collides, but guard structural keywords that can
    # precede '(' without being calls
    return tok.upper in _STRUCTURAL_KWS


_ORDER_TERMINATORS = {"LIMIT", "OFFSET", "FETCH", "ROWS", "RANGE", "GROUPS",
                      "UNION", "EXCEPT", "INTERSECT", "WINDOW", "HAVING"}


def _pass_order_by_nulls(tokens: list[Tok]) -> list[Tok]:
    insertions: list[int] = []  # positions where [NULLS LAST] is inserted
    i = 0
    n = len(tokens)
    while i < n:
        if tokens[i].is_kw("ORDER") and i + 1 < n and tokens[i + 1].is_kw("BY"):
            j = i + 2
            depth = 0
            item_start = j
            item_last_tokens: list[Tok] = []

            def close_item(end: int) -> None:
                seg = tokens[item_start:end]
                if not seg:
                    return
                uppers = [s.upper for s in seg]
                if "NULLS" in uppers:
                    return
                if uppers[-1] == "DESC":
                    return  # Spark DESC default is already NULLS LAST
                insertions.append(end)

            while j < n:
                t = tokens[j]
                if t.text == "(":
                    depth += 1
                elif t.text == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif depth == 0:
                    if t.text in (",",):
                        close_item(j)
                        item_start = j + 1
                    elif t.text == ";" or (t.kind == "ident" and t.upper in _ORDER_TERMINATORS):
                        break
                j += 1
            close_item(j)
            i = j
            continue
        i += 1
    if not insertions:
        return tokens
    out = list(tokens)
    for pos in sorted(set(insertions), reverse=True):
        out[pos:pos] = [ident("NULLS"), ident("LAST")]
    return out


def _pass_at_time_zone(tokens: list[Tok]) -> list[Tok]:
    """``x AT TIME ZONE 'z'`` → ``from_utc_timestamp(x, 'z')``.

    The session runs UTC (session.py), so a zone-less timestamp IS the
    UTC instant; from_utc_timestamp yields the wall-clock a user in ``z``
    observes — the rendering semantics of the reference's
    timestamp-with-time-zone (spi/type/DateTimeEncoding.java packing).
    The operand is the single preceding token or parenthesized group.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if (
            t.is_kw("AT") and i + 3 < n and tokens[i + 1].is_kw("TIME")
            and tokens[i + 2].is_kw("ZONE") and out
        ):
            zone = tokens[i + 3]
            # pop the operand: a ')'-terminated group or one value token
            if out[-1].text == ")":
                depth = 0
                j = len(out) - 1
                while j >= 0:
                    if out[j].text == ")":
                        depth += 1
                    elif out[j].text == "(":
                        depth -= 1
                        if depth == 0:
                            break
                    j -= 1
                # include a function name directly before the '('
                if j > 0 and out[j - 1].kind in ("ident", "qident") \
                        and out[j - 1].upper not in _STRUCTURAL_KWS:
                    j -= 1
                operand = out[j:]
                del out[j:]
            else:
                operand = [out.pop()]
                # typed literal: TIMESTAMP '...' / DATE '...'
                if operand[0].kind == "string" and out and out[-1].is_kw("TIMESTAMP", "DATE"):
                    operand.insert(0, out.pop())
                # qualified name: a.b.c
                while len(out) >= 2 and out[-1].text == "." and out[-2].kind in ("ident", "qident"):
                    operand.insert(0, out.pop())
                    operand.insert(0, out.pop())
            out.extend(_call("from_utc_timestamp", operand, [zone]))
            i += 4
            continue
        out.append(t)
        i += 1
    return out


def _pass_time_arith(tokens: list[Tok]) -> list[Tok]:
    """``TIME 'x' ± INTERVAL 'n' unit`` with midnight wrap-around.

    Presto's TIME arithmetic is modulo 24h (TimeOperators.java — the packed
    millis-of-day wraps), while Spark's TIME + interval raises
    DATETIME_OVERFLOW when the result leaves [00:00, 24:00).  Rewriting the
    literal onto an anchor date and casting back to TIME reproduces the
    wrap: the cast keeps only the time-of-day portion.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if (
            t.is_kw("TIME") and i + 5 < n
            and tokens[i + 1].kind == "string"
            and tokens[i + 2].text in ("+", "-")
            and tokens[i + 3].is_kw("INTERVAL")
            and tokens[i + 4].kind == "string"
        ):
            lit = string_value(tokens[i + 1])
            # Spark has no TIMESTAMP→TIME cast; slice the time-of-day off
            # the text rendering (micros-preserving).  Only passthrough
            # function names here — this pass runs before the dialect
            # function rules, which would reinterpret e.g. date_format's
            # format string as MySQL-style.
            out.extend([
                ident("to_time"), op("("), ident("substring"), op("("),
                ident("CAST"), op("("), op("("),
                ident("TIMESTAMP"), string_literal(f"1970-01-01 {lit}"),
                tokens[i + 2], tokens[i + 3], tokens[i + 4], tokens[i + 5],
                op(")"), ident("AS"), ident("STRING"), op(")"), op(","),
                Tok("number", "12"), op(")"), op(")"),
            ])
            i += 6
            continue
        out.append(t)
        i += 1
    return out


_RANKING_FNS = {"rank", "dense_rank", "row_number", "percent_rank",
                "cume_dist", "ntile"}
_FRAME_IGNORING_FNS = _RANKING_FNS | {"lead", "lag"}


def _pass_window_compat(tokens: list[Tok]) -> list[Tok]:
    """Window-spec shapes Presto accepts but Spark rejects.

    - ranking functions with an explicit frame: the reference ignores the
      frame for rank/dense_rank/… and lead/lag (WindowOperator evaluates
      them positionally); Spark refuses the specification → strip it.
    - ranking functions with no ORDER BY: every row is a peer in Presto
      (rank()=1); Spark demands an ordered spec → order by a constant,
      which makes all rows peers, reproducing the semantics.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if (
            t.kind == "ident" and t.text.lower() in _FRAME_IGNORING_FNS
            and i + 1 < n and tokens[i + 1].text == "("
        ):
            args_close = find_matching_paren(tokens, i + 1)
            if (
                args_close + 2 < n and tokens[args_close + 1].is_kw("OVER")
                and tokens[args_close + 2].text == "("
            ):
                spec_close = find_matching_paren(tokens, args_close + 2)
                spec = tokens[args_close + 3:spec_close]
                # strip a top-level frame clause (always spec-final)
                depth = 0
                frame_at = None
                has_order = False
                for k, tok in enumerate(spec):
                    if tok.text == "(":
                        depth += 1
                    elif tok.text == ")":
                        depth -= 1
                    elif depth == 0 and tok.is_kw("ROWS", "RANGE", "GROUPS"):
                        frame_at = k
                        break
                    elif depth == 0 and tok.is_kw("ORDER"):
                        has_order = True
                if frame_at is not None:
                    spec = spec[:frame_at]
                if not has_order and t.text.lower() in _RANKING_FNS:
                    spec = spec + [ident("ORDER"), ident("BY"),
                                   string_literal("x")]
                out.extend(tokens[i:args_close + 2])
                out.append(op("("))
                out.extend(_pass_window_compat(spec))
                out.append(op(")"))
                i = spec_close + 1
                continue
        out.append(t)
        i += 1
    return out


def _pass_in_values(tokens: list[Tok]) -> list[Tok]:
    """``x IN (VALUES …)`` → ``x IN (SELECT * FROM (VALUES …))``.

    Presto treats the VALUES rows as a subquery relation
    (SqlBase.g4 inPredicate → query); Spark's IN-list parser sees
    ``VALUES`` as a function call.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if (
            t.is_kw("IN") and i + 2 < n and tokens[i + 1].text == "("
            and tokens[i + 2].is_kw("VALUES")
        ):
            close = find_matching_paren(tokens, i + 1)
            body = _pass_in_values(tokens[i + 2:close])
            out.extend([ident("IN"), op("("), ident("SELECT"), op("*"),
                        ident("FROM"), op("(")] + body
                       + [op(")"), ident("__in_values"), op(")")])
            i = close + 1
            continue
        out.append(t)
        i += 1
    return out


_GROUP_LIST_STOP = ("HAVING", "ORDER", "LIMIT", "UNION", "EXCEPT",
                    "INTERSECT", "WINDOW", "OFFSET", "FETCH")


def _pass_order_by_grouping(tokens: list[Tok], _ctr: list[int] | None = None) -> list[Tok]:
    """``ORDER BY grouping(…)`` on a grouped query → hoisted sort column.

    Presto resolves grouping() in ORDER BY against the source scope
    (GroupingOperationRewriter); Spark's Sort runs above the Aggregate
    and cannot resolve grouping() there at all.  Rewrite

        SELECT <list> FROM … GROUP BY … ORDER BY grouping(b), x

    to

        SELECT * EXCEPT (__ord1) FROM
          (SELECT <list>, grouping(b) AS __ord1 FROM … GROUP BY …) __obg
        ORDER BY __ord1, x

    so the grouping() lands inside the Aggregate where Spark computes it.
    Runs before the grouping()-composition pass, which then rewrites the
    hoisted call against the inner GROUP BY like any other occurrence.
    """
    if _ctr is None:
        _ctr = [0]
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            out += [t] + _pass_order_by_grouping(tokens[i + 1:close], _ctr) + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    tokens = out
    n = len(tokens)
    idx: dict[str, int] = {}
    j = 0
    while j < n:
        s = tokens[j]
        if s.text == "(":
            j = find_matching_paren(tokens, j) + 1
            continue
        if s.kind == "ident":
            u = s.upper
            if u in ("SELECT", "FROM", "GROUP", "ORDER", "LIMIT") and u not in idx:
                idx[u] = j
            if u in _SETOP_KWS:
                return tokens
        j += 1
    if not {"SELECT", "FROM", "ORDER"} <= idx.keys():
        return tokens
    sel_i, from_i, order_i = idx["SELECT"], idx["FROM"], idx["ORDER"]
    if not (sel_i < from_i < order_i):
        return tokens
    group_i = idx.get("GROUP")
    if group_i is not None and not (from_i < group_i < order_i):
        return tokens
    if sel_i + 1 < n and tokens[sel_i + 1].is_kw("DISTINCT"):
        # DISTINCT requires ORDER BY expressions from the select list
        # (the reference rejects anything else), so nothing to hoist
        return tokens
    limit_i = idx.get("LIMIT", n)
    if order_i + 1 >= n or tokens[order_i + 1].upper != "BY":
        return tokens
    items = split_top_level(tokens[order_i + 2:limit_i])
    hoists: list[tuple[str, list[Tok]]] = []
    new_items: list[list[Tok]] = []
    for item in items:
        has_grouping = group_i is not None and any(
            tok.is_kw("GROUPING") and k + 1 < len(item)
            and item[k + 1].text == "(" for k, tok in enumerate(item)
        )
        # window functions in ORDER BY: Spark's Sort cannot evaluate
        # OVER at all; Presto resolves them against the source scope —
        # which is exactly what a select-list position provides
        has_window = any(tok.is_kw("OVER") for tok in item)
        # IN (subquery) / EXISTS in ORDER BY: Catalyst allows predicate
        # subqueries in projections but not in Sort — same hoist
        has_subq = _has_subquery(item)
        if not has_grouping and not has_window and not has_subq:
            new_items.append(item)
            continue
        # split off the ASC/DESC/NULLS FIRST|LAST suffix
        end = len(item)
        while end > 0 and item[end - 1].is_kw(
            "ASC", "DESC", "NULLS", "FIRST", "LAST"
        ):
            end -= 1
        expr = item[:end]
        if has_window:
            # Presto resolves ORDER BY expressions against the output
            # scope first (StatementAnalyzer orderBy scope: aliases
            # shadow source columns); the hoisted select-list position
            # resolves source-first, so inline the output aliases
            expr = _substitute_aliases(expr, tokens[sel_i + 1:from_i])
        _ctr[0] += 1
        var = f"__ord{_ctr[0]}"
        hoists.append((var, expr))
        new_items.append([ident(var)] + item[end:])
    # Spark resolves ORDER BY source-scope references through a plain
    # Aggregate (ResolveReferences adds the missing attribute), but NOT
    # through the Expand that GROUPING SETS/ROLLUP/CUBE plan to — there
    # an item like ``ORDER BY -a`` with ``SELECT a AS foo`` is an
    # UNRESOLVED_COLUMN.  Presto resolves it against the source scope
    # (StatementAnalyzer orderBy), so under an Expand-producing GROUP BY
    # run the resolve-against-output hoist below even when no
    # grouping()/window/subquery item forced one already.
    gs_group = group_i is not None and any(
        tok.is_kw("GROUPING", "ROLLUP", "CUBE")
        for tok in _depth0_iter(tokens[group_i + 2:order_i])
    )
    if not hoists and not gs_group:
        return tokens
    # The wrap hides source/group-key columns from ORDER BY: a plain item
    # referencing a column absent from the SELECT list (Presto's
    # source-scope fallback, e.g. ``SELECT count(*) … GROUP BY GROUPING
    # SETS ((a),(b)) ORDER BY grouping(a), a``) would not resolve against
    # __obg.  Hoist those items into the inner select as __ordN too.
    out_names = _select_output_names(tokens[sel_i + 1:from_i])
    if out_names is not None:
        for k, item in enumerate(new_items):
            if any(tok.kind == "ident" and tok.text.startswith("__ord")
                   for tok in item):
                continue
            end = len(item)
            while end > 0 and item[end - 1].is_kw(
                "ASC", "DESC", "NULLS", "FIRST", "LAST"
            ):
                end -= 1
            expr = item[:end]
            if _order_item_resolves(expr, out_names):
                continue
            _ctr[0] += 1
            var = f"__ord{_ctr[0]}"
            hoists.append(
                (var, _substitute_aliases(expr, tokens[sel_i + 1:from_i]))
            )
            new_items[k] = [ident(var)] + item[end:]
    if not hoists:  # gs_group alone, but every item resolves: no wrap
        return tokens
    inner = list(tokens[sel_i:from_i])
    for var, expr in hoists:
        inner += [op(","), op("(")] + expr + [op(")"), ident("AS"), ident(var)]
    inner += tokens[from_i:order_i]
    res: list[Tok] = tokens[:sel_i] + [
        ident("SELECT"), op("*"), ident("EXCEPT"), op("("),
    ]
    for k, (var, _) in enumerate(hoists):
        if k:
            res.append(op(","))
        res.append(ident(var))
    res += [op(")"), ident("FROM"), op("(")] + inner + [
        op(")"), ident("__obg"), ident("ORDER"), ident("BY"),
    ]
    for k, item in enumerate(new_items):
        if k:
            res.append(op(","))
        res += item
    res += tokens[limit_i:]
    return res


def _substitute_aliases(expr: list[Tok], select_seg: list[Tok]) -> list[Tok]:
    """Inline ``<e> AS <alias>`` select-list aliases into ``expr`` —
    bare identifier references only (qualified ``t.alias`` stays a source
    reference, mirroring the reference's ORDER BY scoping)."""
    aliases: dict[str, list[Tok]] = {}
    for item in split_top_level(select_seg):
        if (
            len(item) >= 3 and item[-2].is_kw("AS")
            and item[-1].kind == "ident"
        ):
            aliases[item[-1].upper] = item[:-2]
    if not aliases:
        return expr
    out: list[Tok] = []
    for k, t in enumerate(expr):
        nxt = expr[k + 1] if k + 1 < len(expr) else None
        if (
            t.kind == "ident" and t.upper in aliases
            and not (out and out[-1].text == ".")
            and (nxt is None or nxt.text not in (".", "("))
        ):
            out += [op("(")] + aliases[t.upper] + [op(")")]
        else:
            out.append(t)
    return out


_NON_COLUMN_KWS = frozenset((
    "AND", "OR", "NOT", "CASE", "WHEN", "THEN", "ELSE", "END", "IS",
    "NULL", "TRUE", "FALSE", "BETWEEN", "IN", "LIKE", "ESCAPE", "CAST",
    "TRY_CAST", "AS", "DISTINCT", "ASC", "DESC", "NULLS", "FIRST",
    "LAST", "INTERVAL", "DATE", "TIME", "TIMESTAMP", "ROW", "ARRAY",
    "MAP", "EXISTS", "ALL", "ANY", "SOME", "OVER", "PARTITION", "BY",
    "ORDER", "ROWS", "RANGE", "CURRENT", "PRECEDING", "FOLLOWING",
    "UNBOUNDED", "CURRENT_DATE", "CURRENT_TIME", "CURRENT_TIMESTAMP",
    "LOCALTIME", "LOCALTIMESTAMP", "AT", "ZONE",
))


def _select_output_names(select_seg: list[Tok]) -> set[str] | None:
    """Upper-cased output column names of a SELECT list, or None when a
    star makes the output indeterminable syntactically.  Anonymous
    expression items contribute nothing (their reference names are
    synthesized and unreferenceable)."""
    names: set[str] = set()
    for item in split_top_level(select_seg):
        if any(t.text == "*" for t in _depth0(item)):
            return None
        toks = item
        # explicit AS alias at depth 0
        alias = None
        for k in range(len(toks) - 1, -1, -1):
            if toks[k].is_kw("AS"):
                alias = toks[k + 1] if k + 1 < len(toks) else None
                break
            if toks[k].text == ")":
                break
        if alias is not None and alias.kind in ("ident", "qident"):
            names.add(alias.text.strip('"').upper())
            continue
        last = toks[-1]
        if last.kind not in ("ident", "qident"):
            continue
        if len(toks) == 1 or toks[-2].text == ".":
            names.add(last.text.strip('"').upper())  # bare / qualified col
        elif toks[-2].kind in ("ident", "qident") or toks[-2].text == ")":
            names.add(last.text.strip('"').upper())  # implicit alias
    return names


def _depth0(item: list[Tok]):
    d = 0
    for t in item:
        if t.text == "(":
            d += 1
        elif t.text == ")":
            d -= 1
        elif d == 0:
            yield t


def _order_item_resolves(expr: list[Tok], out_names: set[str]) -> bool:
    """Whether an ORDER BY expression references only columns available
    in the wrapped query's output (``out_names``).  Qualified references
    and unknown bare columns do not resolve against the derived table."""
    n = len(expr)
    for j, t in enumerate(expr):
        if t.kind == "number" or t.kind == "string" or t.kind == "op":
            continue
        if t.kind == "qident":
            if j + 1 < n and expr[j + 1].text == ".":
                return False  # qualifier — breaks under the wrap
            if j > 0 and expr[j - 1].text == ".":
                continue
            if t.text.strip('"').upper() not in out_names:
                return False
            continue
        if t.is_kw(*_NON_COLUMN_KWS):
            continue
        if j + 1 < n and expr[j + 1].text in ("(", "."):
            if expr[j + 1].text == ".":
                return False  # qualified reference
            continue  # function call
        if j > 0 and expr[j - 1].text == ".":
            continue
        if j > 0 and expr[j - 1].is_kw("AS", "INTERVAL"):
            continue  # CAST target type / interval unit
        if t.upper not in out_names:
            return False
    return True


def _pass_gs_empty_global(tokens: list[Tok]) -> list[Tok]:
    """Explicit ``()`` sets in GROUPING SETS → separate global-agg arms.

    Over empty input the reference emits one row per global ``()`` set
    (ImplementIntersectAndExceptAsUnion-adjacent semantics: a global
    aggregation always yields a row); Spark's Expand emits nothing.
    Splitting each explicit ``()`` into a ``UNION ALL SELECT <aggs,
    NULL keys> FROM …`` arm is semantically identical for empty AND
    non-empty input, so no count guard is needed.  CUBE/ROLLUP (whose
    implicit global set is the common perf-sensitive spelling) keep
    Spark's single-scan Expand — their empty-input divergence stays
    documented; the extra scan is only paid where the user literally
    wrote ``()``.

    Guards: plain SELECT…FROM…GROUP BY GROUPING SETS(…) block, no
    HAVING/ORDER/DISTINCT/grouping(); select items must be pure
    aggregates (kept) or aggregate-free (→ NULL keys) — a mixed item
    aborts the rewrite.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            out += [t] + _pass_gs_empty_global(tokens[i + 1:close]) + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    tokens = out
    n = len(tokens)
    idx: dict[str, int] = {}
    j = 0
    while j < n:
        s = tokens[j]
        if s.text == "(":
            j = find_matching_paren(tokens, j) + 1
            continue
        if s.kind == "ident":
            u = s.upper
            if u in ("SELECT", "FROM", "GROUP", "HAVING", "ORDER",
                     "LIMIT") and u not in idx:
                idx[u] = j
            if u in _SETOP_KWS:
                return tokens
        j += 1
    if not {"SELECT", "FROM", "GROUP"} <= idx.keys() or "HAVING" in idx:
        return tokens
    if "ORDER" in idx:
        # ORDER BY applies to the whole union result — detach it,
        # rewrite the aggregation block, and re-append (LIMIT rides
        # along in the suffix).  Found by the hypothesis grouping-sets
        # differential: an explicit () arm under ORDER BY previously
        # aborted the rewrite and lost the empty-input global row.
        head = _pass_gs_empty_global(tokens[: idx["ORDER"]])
        return head + tokens[idx["ORDER"]:]
    sel_i, from_i, group_i = idx["SELECT"], idx["FROM"], idx["GROUP"]
    if not (sel_i < from_i < group_i):
        return tokens
    if not (
        group_i + 4 < n and tokens[group_i + 1].upper == "BY"
        and tokens[group_i + 2].is_kw("GROUPING")
        and tokens[group_i + 3].upper == "SETS"
        and tokens[group_i + 4].text == "("
    ):
        return tokens
    close = find_matching_paren(tokens, group_i + 4)
    limit_i = idx.get("LIMIT", n)
    if any(tok.kind == "ident" for tok in tokens[close + 1:limit_i]):
        return tokens  # extra grouping keys after the sets list
    sets = split_top_level(tokens[group_i + 5:close])
    empty_count = sum(
        1 for s in sets
        if len(s) == 2 and s[0].text == "(" and s[1].text == ")"
    )
    if empty_count == 0:
        return tokens
    remaining = [
        s for s in sets
        if not (len(s) == 2 and s[0].text == "(" and s[1].text == ")")
    ]
    select_seg = tokens[sel_i + 1:from_i]
    if select_seg and select_seg[0].is_kw("DISTINCT"):
        return tokens
    if any(tok.is_kw("GROUPING") for tok in select_seg):
        return tokens
    keys = _grouping_key_names(tokens[group_i + 5:close])
    arm_items: list[list[Tok]] = []
    for item in split_top_level(select_seg):
        alias_toks: list[Tok] = []
        core = item
        if len(item) >= 3 and item[-2].is_kw("AS") and item[-1].kind == "ident":
            alias_toks = item[-2:]
            core = item[:-2]
        has_agg, bare_ref = _classify_item(core)
        if has_agg and bare_ref:
            return tokens
        if has_agg:
            arm_items.append(core + alias_toks)
        else:
            # evaluate the item at NULL grouping keys: coalesce(k,'x')
            # must yield 'x' in the global row, constants stay themselves
            sub = _null_keys(core, keys)
            if sub is None:
                return tokens
            arm_items.append(sub + alias_toks)
    arm: list[Tok] = [ident("SELECT")]
    for k, it in enumerate(arm_items):
        if k:
            arm.append(op(","))
        arm += it
    arm += tokens[from_i:group_i]
    res: list[Tok]
    if remaining:
        res = tokens[:group_i] + [
            ident("GROUP"), ident("BY"), ident("GROUPING"), ident("SETS"), op("("),
        ]
        for k, s in enumerate(remaining):
            if k:
                res.append(op(","))
            res += s
        res.append(op(")"))
        arms = empty_count
    else:
        res = list(arm)
        arms = empty_count - 1
    for _ in range(arms):
        res += [ident("UNION"), ident("ALL")] + arm
    return res + tokens[limit_i:]


def _pass_cube_rollup_empty_global(tokens: list[Tok]) -> list[Tok]:
    """CUBE/ROLLUP over empty input: compensate the missing global row.

    The reference emits the global ``()`` set's aggregation row even
    when the (filtered) input is empty (AbstractTestAggregations.
    testCubeNoInput / testRollupNoInput); Spark's Expand+HashAggregate
    emits nothing.  The rewrite appends one UNION ALL arm that is free
    at scale:

    - the arm aggregates ``FROM src WHERE (orig) AND FALSE`` — Catalyst
      folds it to an empty LocalRelation (PropagateEmptyRelation), so
      the global aggregate's empty-input values (SUM→NULL, COUNT→0, …)
      are produced WITHOUT any scan;
    - the arm is gated by ``HAVING (SELECT count(*) FROM (SELECT 1 FROM
      src WHERE orig LIMIT 1)) = 0`` — a CollectLimit(1) probe that
      early-exits at the first matching row on non-empty input (the
      common case: near-free) and performs one pushdown-filtered scan
      only when the edge case actually fires.

    tools/plan_audit-style shape asserted in tests: the arm contributes
    a LocalTableScan + a LIMIT-1 subquery, never a second full
    aggregation scan.  Applies only to the plain ``GROUP BY CUBE(...)``
    / ``GROUP BY ROLLUP(...)`` block (no extra keys — a mixed GROUP BY
    has no global set), no HAVING/DISTINCT/grouping() in the query.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            out += (
                [t]
                + _pass_cube_rollup_empty_global(tokens[i + 1:close])
                + [tokens[close]]
            )
            i = close + 1
            continue
        out.append(t)
        i += 1
    tokens = out
    n = len(tokens)
    idx: dict[str, int] = {}
    j = 0
    while j < n:
        s = tokens[j]
        if s.text == "(":
            j = find_matching_paren(tokens, j) + 1
            continue
        if s.kind == "ident":
            u = s.upper
            if u in ("SELECT", "FROM", "GROUP", "HAVING", "ORDER",
                     "LIMIT", "WHERE") and u not in idx:
                idx[u] = j
            if u in _SETOP_KWS:
                return tokens
        j += 1
    if not {"SELECT", "FROM", "GROUP"} <= idx.keys() or "HAVING" in idx:
        return tokens
    if "ORDER" in idx:
        head = _pass_cube_rollup_empty_global(tokens[: idx["ORDER"]])
        return head + tokens[idx["ORDER"]:]
    sel_i, from_i, group_i = idx["SELECT"], idx["FROM"], idx["GROUP"]
    if not (sel_i < from_i < group_i):
        return tokens
    if not (
        group_i + 3 < n and tokens[group_i + 1].upper == "BY"
        and tokens[group_i + 2].is_kw("CUBE", "ROLLUP")
        and tokens[group_i + 3].text == "("
    ):
        return tokens
    close = find_matching_paren(tokens, group_i + 3)
    limit_i = idx.get("LIMIT", n)
    if any(tok.kind == "ident" for tok in tokens[close + 1:limit_i]):
        return tokens  # extra grouping keys — no implicit global set
    select_seg = tokens[sel_i + 1:from_i]
    if select_seg and select_seg[0].is_kw("DISTINCT"):
        return tokens
    if any(tok.is_kw("GROUPING", "GROUPING_ID") for tok in select_seg):
        return tokens
    keys = _grouping_key_names(tokens[group_i + 4:close])
    arm_items: list[list[Tok]] = []
    for item in split_top_level(select_seg):
        alias_toks: list[Tok] = []
        core = item
        if len(item) >= 3 and item[-2].is_kw("AS") and item[-1].kind == "ident":
            alias_toks = item[-2:]
            core = item[:-2]
        has_agg, bare_ref = _classify_item(core)
        if has_agg and bare_ref:
            return tokens
        if has_agg:
            arm_items.append(core + alias_toks)
        else:
            # evaluate the item at NULL grouping keys (ADVICE r5: a
            # composite expression like coalesce(k,'x') must yield 'x'
            # in the compensating global row, not NULL)
            sub = _null_keys(core, keys)
            if sub is None:
                return tokens
            arm_items.append(sub + alias_toks)
    body = tokens[from_i:group_i]  # FROM … [WHERE …]
    if "WHERE" in idx and from_i < idx["WHERE"] < group_i:
        w = idx["WHERE"] - from_i
        dead_body = (
            body[: w + 1] + [op("(")] + body[w + 1:]
            + [op(")"), ident("AND"), ident("FALSE")]
        )
    else:
        dead_body = body + [ident("WHERE"), ident("FALSE")]
    probe = (
        [op("("), ident("SELECT"), ident("count"), op("("), op("*"),
         op(")"), ident("FROM"), op("("), ident("SELECT"),
         Tok("number", "1")]
        + body
        + [ident("LIMIT"), Tok("number", "1"), op(")"),
           ident("__fps_empty_probe__"), op(")")]
    )
    arm: list[Tok] = [ident("UNION"), ident("ALL"), ident("SELECT")]
    for k, it in enumerate(arm_items):
        if k:
            arm.append(op(","))
        arm += it
    arm += dead_body
    arm += [ident("HAVING")] + probe + [op("="), Tok("number", "0")]
    return tokens[:limit_i] + arm + tokens[limit_i:]


def _classify_item(core: list[Tok]) -> tuple[bool, bool]:
    """(contains an aggregate call, contains a bare column reference
    outside every aggregate call) — scanned linearly with agg spans
    tracked by paren depth."""
    has_agg = False
    bare_ref = False
    agg_stack: list[int] = []
    depth = 0
    for k, t in enumerate(core):
        nxt = core[k + 1] if k + 1 < len(core) else None
        prev = core[k - 1] if k else None
        if t.text == "(":
            if prev is not None and prev.kind == "ident" and prev.upper in _AGG_NAMES:
                agg_stack.append(depth)
            depth += 1
        elif t.text == ")":
            depth -= 1
            if agg_stack and agg_stack[-1] == depth:
                agg_stack.pop()
        elif t.kind == "ident":
            if t.upper in _AGG_NAMES and nxt is not None and nxt.text == "(":
                has_agg = True
            elif not agg_stack:
                if (
                    (nxt is None or nxt.text != "(")
                    and not t.is_kw(
                        "NULL", "TRUE", "FALSE", "AS", "AND", "OR", "NOT",
                        "IS", "CASE", "WHEN", "THEN", "ELSE", "END",
                        "INTERVAL", "DISTINCT",
                    )
                    and not (prev is not None and prev.is_kw("AS"))
                ):
                    bare_ref = True
    return has_agg, bare_ref


def _ref_name(t: Tok) -> str:
    if t.kind == "qident":
        return t.text[1:-1].replace('""', '"').lower()
    return t.text.lower()


def _null_keys(core: list[Tok], keys: set[str]) -> list[Tok] | None:
    """Replace grouping-key references in a select item with NULL so the
    expression EVALUATES at the global set's NULL keys (coalesce(k,'x')
    → coalesce(NULL,'x') → 'x'), instead of nulling the whole item.
    Qualified chains (t.k) collapse to a single NULL.  Returns None when
    a reference shape is ambiguous (struct access on a key) — callers
    abort the rewrite."""
    out: list[Tok] = []
    agg_stack: list[int] = []
    depth = 0
    i = 0
    n = len(core)
    while i < n:
        t = core[i]
        nxt = core[i + 1] if i + 1 < n else None
        prev = core[i - 1] if i else None
        if t.text == "(":
            if prev is not None and prev.kind == "ident" and prev.upper in _AGG_NAMES:
                agg_stack.append(depth)
            depth += 1
        elif t.text == ")":
            depth -= 1
            if agg_stack and agg_stack[-1] == depth:
                agg_stack.pop()
        is_ref = (
            not agg_stack
            and t.kind in ("ident", "qident")
            and not (nxt is not None and nxt.text == "(")
            and not (prev is not None and (prev.text == "." or prev.is_kw("AS")))
        )
        if is_ref and _ref_name(t) in keys:
            if nxt is not None and nxt.text == ".":
                return None  # struct access on a key — can't NULL safely
            out.append(ident("NULL"))
            i += 1
            continue
        if (
            is_ref
            and nxt is not None and nxt.text == "."
            and i + 2 < n and core[i + 2].kind in ("ident", "qident")
            and _ref_name(core[i + 2]) in keys
            and not (i + 3 < n and core[i + 3].text in (".", "("))
        ):
            out.append(ident("NULL"))
            i += 3
            continue
        out.append(t)
        i += 1
    return out


def _grouping_key_names(seg: list[Tok]) -> set[str]:
    """Identifier names appearing in a grouping-set/CUBE/ROLLUP key list.
    Qualified chains contribute only their FINAL part (t.k → k): the
    qualifier must not be treated as a key or bare `o` references — and
    the o-of-o.k chain start — would misclassify."""
    return {
        _ref_name(t) for i, t in enumerate(seg)
        if t.kind in ("ident", "qident")
        and not (i + 1 < len(seg) and seg[i + 1].text == ".")
    }


def _pass_grouping_sets_for_grouping_fn(tokens: list[Tok]) -> list[Tok]:
    """Wrap plain ``GROUP BY c1, c2`` in ``GROUPING SETS ((c1, c2))`` when
    the statement uses grouping()/grouping_id().

    Presto's grouping() is defined for any GROUP BY (returning 0 bits,
    GroupingOperationRewriter.java); Spark only resolves it when the plan
    has an Expand.  The single-set wrap is the identity grouping.  Lists
    containing bare ordinals are left alone — inside GROUPING SETS Spark
    would read them as literals.
    """
    has_grouping = any(
        t.kind == "ident" and t.upper in ("GROUPING", "GROUPING_ID")
        and i + 1 < len(tokens) and tokens[i + 1].text == "("
        for i, t in enumerate(tokens)
    )
    if not has_grouping:
        return tokens
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        out.append(t)
        if t.is_kw("GROUP") and i + 1 < n and tokens[i + 1].is_kw("BY") \
                and not (i + 2 < n and tokens[i + 2].is_kw(
                    "GROUPING", "CUBE", "ROLLUP")):
            # find the end of the grouping list at this nesting depth
            j = i + 2
            depth = 0
            while j < n:
                tj = tokens[j]
                if tj.text == "(":
                    depth += 1
                elif tj.text == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif depth == 0 and tj.kind == "ident" \
                        and tj.upper in _GROUP_LIST_STOP:
                    break
                j += 1
            group_list = tokens[i + 2:j]
            items = split_top_level(group_list)
            has_ordinal = any(
                len(it) == 1 and it[0].kind == "number" for it in items
            )
            if has_ordinal or not group_list:
                out.extend([ident("BY")] + group_list)
            else:
                out.extend([ident("BY"), ident("GROUPING"), ident("SETS"),
                            op("("), op("(")] + group_list
                           + [op(")"), op(")")])
            i = j
            continue
        i += 1
    return out


_LIKE_ESC_CANDIDATES = "\x01\x02\x03~^#@|!"


def _pass_like_escape(tokens: list[Tok]) -> list[Tok]:
    """LIKE escape-character parity (type/LikeFunctions.java:213-224).

    The reference has NO default escape character: without an ESCAPE
    clause a backslash in the pattern is a literal, and ``ESCAPE ''``
    explicitly disables escaping (getEscapeChar → (char) -1).  Spark's
    LIKE defaults the escape to backslash, so a literal pattern
    containing one gets an explicit ESCAPE char that does not occur in
    the pattern.  ``ESCAPE NULL`` nulls the whole predicate
    (RETURN_NULL_ON_NULL) — respelled as an always-NULL comparison.
    Non-literal patterns pass through untouched (their backslashes are
    data-dependent; the reference's semantics can't be restored
    statically)."""
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if not (t.is_kw("LIKE") and i + 1 < n
                and tokens[i + 1].kind == "string"):
            out.append(t)
            i += 1
            continue
        pat = tokens[i + 1]
        j = i + 2
        esc: Tok | None = None
        has_escape = j + 1 < n and tokens[j].is_kw("ESCAPE")
        if has_escape:
            esc = tokens[j + 1]
            j += 2
        if esc is not None and esc.is_kw("NULL"):
            # x [NOT] LIKE p ESCAPE NULL → NULL for every x
            # (NOT of NULL is NULL, so the NOT simply drops)
            if out and out[-1].is_kw("NOT"):
                out.pop()
            out += tokenize("= CAST(NULL AS STRING)")
            i = j
            continue
        if esc is not None and esc.kind == "string" \
                and string_value(esc) != "":
            out += [t, pat, tokens[i + 2], esc]  # explicit char: same
            i = j
            continue
        # no escape clause, or ESCAPE '' — escaping disabled
        body = string_value(pat)
        if "\\" not in body:
            out += [t, pat]  # Spark's default escape is inert here
            i = j
            continue
        ch = next((c for c in _LIKE_ESC_CANDIDATES if c not in body), None)
        if ch is None:
            out += tokens[i:j]  # pathological pattern: leave untouched
            i = j
            continue
        out += [t, pat, ident("ESCAPE"), string_literal(ch)]
        i = j
    return out


def _map_comparand(tokens: list[Tok], i: int) -> int | None:
    """If tokens[i:] starts a MAP(...) or CAST(... AS MAP...) operand,
    return the index one past it; else None."""
    t = tokens[i]
    if t.kind != "ident":
        return None
    u = t.upper
    if u == "MAP" and i + 1 < len(tokens) and tokens[i + 1].text == "(":
        return find_matching_paren(tokens, i + 1) + 1
    if u in ("CAST", "TRY_CAST") and i + 1 < len(tokens) \
            and tokens[i + 1].text == "(":
        close = find_matching_paren(tokens, i + 1)
        inner = tokens[i + 2:close]
        for k in range(len(inner) - 1, -1, -1):
            if inner[k].is_kw("AS"):
                # the type may already be a single rendered Spark type
                # token ("MAP<INT, STRING>") after _pass_cast_types
                if k + 1 < len(inner) and inner[k + 1].kind == "ident" \
                        and inner[k + 1].upper.startswith("MAP"):
                    return close + 1
                return None
    return None


def _splice(sql: str, **slots: list[Tok]) -> list[Tok]:
    """Tokenize a fragment, substituting token lists at __NAME__ (token-
    level twin of functions._template — keeps string literals single-
    escaped through repeated render round-trips)."""
    out: list[Tok] = []
    for t in tokenize(sql):
        key = t.text.strip("_").lower() if t.kind == "ident" else ""
        if t.kind == "ident" and t.text.startswith("__") and key in slots:
            out.extend(slots[key])
        else:
            out.append(t)
    return out


def _map_value_depth(seg: list[Tok]) -> int:
    """Literal nesting of a MAP operand's VALUES: 2 when the values are
    themselves MAP constructors (corpus shape), else 1."""
    count = sum(
        1 for k, t in enumerate(seg)
        if t.kind == "ident" and t.upper == "MAP"
        and k + 1 < len(seg) and seg[k + 1].text == "(")
    return 2 if count >= 2 else 1


def _map_deq_sql(a: str, b: str, vdepth: int, d: int = 0) -> str:
    """Distinct-style map equality (MapDistinctFromOperator semantics:
    NULL values compare equal to NULL) over rendered placeholders."""
    e = f"__mdq{d}"
    if vdepth <= 1:
        val = f"(element_at({b}, {e}.key) <=> {e}.value)"
    else:
        inner = _map_deq_sql(f"{e}.value", f"element_at({b}, {e}.key)",
                             vdepth - 1, d + 1)
        val = (f"(CASE WHEN {e}.value IS NULL "
               f"AND element_at({b}, {e}.key) IS NULL THEN true "
               f"WHEN {e}.value IS NULL "
               f"OR element_at({b}, {e}.key) IS NULL THEN false "
               f"ELSE {inner} END)")
    return (f"(size({a}) = size({b}) AND forall(map_entries({a}), "
            f"{e} -> array_contains(map_keys({b}), {e}.key) AND {val}))")


def _pass_map_equality(tokens: list[Tok]) -> list[Tok]:
    """``MAP(...) = MAP(...)`` (and !=/<>) — Spark cannot compare MAP
    types at all; the reference's MapEqualOperator compares them as
    unordered key→value sets with three-valued logic: unequal sizes or
    key sets → false, any strictly-unequal value → false, any
    indeterminate (NULL) value comparison → NULL, else true.  Only
    syntactically-evident map operands (MAP constructors / casts to
    MAP) rewrite — map-typed columns are invisible at this layer."""
    out: list[Tok] = []
    i = 0
    n = len(tokens)

    def dist_tail(j: int):
        """(negated, rhs_start) if tokens[j:] is IS [NOT] DISTINCT FROM."""
        if j < n and tokens[j].is_kw("IS"):
            k = j + 1
            neg = False
            if k < n and tokens[k].is_kw("NOT"):
                neg, k = True, k + 1
            if k + 1 < n and tokens[k].is_kw("DISTINCT") \
                    and tokens[k + 1].is_kw("FROM"):
                return neg, k + 2
        return None

    while i < n:
        # NULL IS [NOT] DISTINCT FROM MAP(...) — Spark's <=> cannot
        # order maps (MapDistinctFromOperator in the reference)
        if tokens[i].is_kw("NULL"):
            dt = dist_tail(i + 1)
            if dt is not None:
                neg, rs = dt
                endr = _map_comparand(tokens, rs)
                if endr is not None:
                    b = render(_pass_map_equality(tokens[rs:endr]))
                    cond = "IS NULL" if neg else "IS NOT NULL"
                    out += tokenize(f"(({b}) {cond})")
                    i = endr
                    continue
        endl = _map_comparand(tokens, i)
        if endl is not None:
            dt = dist_tail(endl)
            if dt is not None:
                neg, rs = dt
                endr = _map_comparand(tokens, rs)
                rhs_null = rs < n and tokens[rs].is_kw("NULL")
                if endr is not None or rhs_null:
                    a = render(_pass_map_equality(tokens[i:endl]))
                    if rhs_null:
                        cond = "IS NULL" if neg else "IS NOT NULL"
                        out += tokenize(f"(({a}) {cond})")
                        i = rs + 1
                        continue
                    b = render(_pass_map_equality(tokens[rs:endr]))
                    vdepth = max(_map_value_depth(tokens[i:endl]),
                                 _map_value_depth(tokens[rs:endr]))
                    eq = _map_deq_sql(a, b, vdepth)
                    if neg:
                        expr = (f"(CASE WHEN ({a}) IS NULL AND ({b}) IS NULL "
                                f"THEN true WHEN ({a}) IS NULL OR ({b}) IS NULL "
                                f"THEN false ELSE {eq} END)")
                    else:
                        expr = (f"(CASE WHEN ({a}) IS NULL AND ({b}) IS NULL "
                                f"THEN false WHEN ({a}) IS NULL OR ({b}) IS NULL "
                                f"THEN true ELSE NOT {eq} END)")
                    out += tokenize(expr)
                    i = endr
                    continue
        if endl is not None and endl < n \
                and tokens[endl].text in ("=", "!=", "<>"):
            op_text = tokens[endl].text
            endr = _map_comparand(tokens, endl + 1)
            if endr is not None:
                a = render(_pass_map_equality(tokens[i:endl]))
                b = render(_pass_map_equality(tokens[endl + 1:endr]))
                eq = (
                    f"(CASE WHEN size({a}) <> size({b}) THEN false "
                    f"WHEN exists(map_entries({a}), __mqe -> "
                    f"NOT array_contains(map_keys({b}), __mqe.key)) "
                    f"THEN false "
                    f"WHEN exists(map_entries({a}), __mqe -> "
                    f"(element_at({b}, __mqe.key) = __mqe.value) = false) "
                    f"THEN false "
                    f"WHEN exists(map_entries({a}), __mqe -> "
                    f"(element_at({b}, __mqe.key) = __mqe.value) IS NULL) "
                    f"THEN CAST(NULL AS BOOLEAN) ELSE true END)"
                )
                if op_text in ("!=", "<>"):
                    eq = f"(NOT {eq})"
                out += tokenize(eq)
                i = endr
                continue
        out.append(tokens[i])
        i += 1
    return out


def _find_matching_bracket(tokens: list[Tok], open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(tokens)):
        if tokens[i].text == "[":
            depth += 1
        elif tokens[i].text == "]":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced brackets")


def _array_comparand(tokens: list[Tok], i: int):
    """(end, literal_depth) if tokens[i:] starts an ARRAY[...] literal
    (or CAST(... AS ARRAY...)); depth counts literal nesting (2 when the
    elements are themselves ARRAY constructors)."""
    t = tokens[i]
    if t.kind != "ident":
        return None

    def elem_is_array(p: list[Tok]) -> bool:
        return bool(p) and p[0].kind == "ident" and p[0].upper == "ARRAY" \
            and len(p) > 1 and p[1].text in ("[", "(")

    if t.upper == "ARRAY" and i + 1 < len(tokens) \
            and tokens[i + 1].text == "[":
        close = _find_matching_bracket(tokens, i + 1)
        depth = 1
        if any(elem_is_array(p)
               for p in split_top_level(tokens[i + 2:close])):
            depth = 2
        return close + 1, depth
    # the constructor may already be in the array(...) call spelling
    # (earlier passes rewrite ARRAY[...])
    if t.upper == "ARRAY" and i + 1 < len(tokens) \
            and tokens[i + 1].text == "(":
        close = find_matching_paren(tokens, i + 1)
        depth = 1
        if any(elem_is_array(p)
               for p in split_top_level(tokens[i + 2:close])):
            depth = 2
        return close + 1, depth
    if t.upper in ("CAST", "TRY_CAST") and i + 1 < len(tokens) \
            and tokens[i + 1].text == "(":
        close = find_matching_paren(tokens, i + 1)
        inner = tokens[i + 2:close]
        for k in range(len(inner) - 1, -1, -1):
            if inner[k].is_kw("AS"):
                if k + 1 < len(inner) and inner[k + 1].is_kw("ARRAY"):
                    depth = sum(1 for x in inner[k + 1:]
                                if x.kind == "ident" and x.upper == "ARRAY")
                    return close + 1, max(1, depth)
                return None
    return None


def _arr_eq_sql(a: str, b: str, depth: int, d: int = 0) -> str:
    """Three-valued array equality (ArrayEqualOperator /
    ArrayDistinctFromOperator: a NULL element comparison is
    indeterminate — ARRAY[1,null] = ARRAY[1,null] is NULL); recursion
    depth follows the literal nesting."""
    x, y, pv = f"__aqx{d}", f"__aqy{d}", f"__aqp{d}"
    if depth <= 1:
        cmp = f"({x} = {y})"
    else:
        inner = _arr_eq_sql(x, y, depth - 1, d + 1)
        cmp = (f"(CASE WHEN {x} IS NULL OR {y} IS NULL "
               f"THEN CAST(NULL AS BOOLEAN) ELSE {inner} END)")
    return (f"(CASE WHEN size({a}) <> size({b}) THEN false "
            f"ELSE forall(zip_with({a}, {b}, ({x}, {y}) -> {cmp}), "
            f"{pv} -> {pv}) END)")


def _pass_array_ops(tokens: list[Tok]) -> list[Tok]:
    """Syntactically-evident ARRAY-literal operator semantics:

    * ``=`` / ``!=`` / ``<>`` between ARRAY literals → three-valued
      element comparison (Spark's array equality treats NULL elements
      as equal; the reference's is indeterminate) — also heals
      mixed-precision DECIMAL element comparisons, which Spark's
      array-level coercion rejects.
    * ``||`` append/prepend (ConcatFunction element variants): an
      ARRAY literal concatenated with a scalar literal, or two ARRAY
      literals of different nesting depth, use
      array_append/array_prepend.

    Array-typed COLUMNS are invisible at this layer — they keep
    Spark's operators (documented residual)."""
    out: list[Tok] = []
    i = 0
    n = len(tokens)

    def scalar_literal_end(j: int):
        """End index (exclusive) if tokens[j:] starts a scalar literal
        (number, string, typed literal, or non-array CAST group)."""
        if j >= n:
            return None
        t = tokens[j]
        if t.kind in ("number", "string"):
            return j + 1
        if t.kind == "ident" and t.upper in ("DATE", "TIMESTAMP", "TIME",
                                             "REAL", "DOUBLE", "DECIMAL") \
                and j + 1 < n and tokens[j + 1].kind == "string":
            return j + 2
        if t.kind == "ident" and t.upper in ("CAST", "TRY_CAST") \
                and j + 1 < n and tokens[j + 1].text == "(" \
                and _array_comparand(tokens, j) is None \
                and _map_comparand(tokens, j) is None:
            return find_matching_paren(tokens, j + 1) + 1
        return None

    while i < n:
        ac = _array_comparand(tokens, i)
        if ac is not None:
            endl, dl = ac
            # ARRAY literal = / != / <> comparand
            if endl < n and tokens[endl].text in ("=", "!=", "<>"):
                rc = _array_comparand(tokens, endl + 1)
                if rc is not None:
                    endr, dr = rc
                    a = render(_pass_array_ops(tokens[i:endl]))
                    b = render(_pass_array_ops(tokens[endl + 1:endr]))
                    eq = _arr_eq_sql(a, b, max(dl, dr))
                    if tokens[endl].text in ("!=", "<>"):
                        eq = f"(NOT {eq})"
                    out += tokenize(eq)
                    i = endr
                    continue
            # ARRAY literal || scalar literal → append;
            # depth-mismatched ARRAY literals → append/prepend
            if endl < n and tokens[endl].text == "||":
                rc = _array_comparand(tokens, endl + 1)
                if rc is not None:
                    endr, dr = rc
                    if dl != dr:
                        fn = "array_append" if dl > dr else "array_prepend"
                        arr = (i, endl) if dl > dr else (endl + 1, endr)
                        el = (endl + 1, endr) if dl > dr else (i, endl)
                        out += _splice(
                            f"{fn}(__ARR__, __EL__)",
                            arr=_pass_array_ops(tokens[arr[0]:arr[1]]),
                            el=_pass_array_ops(tokens[el[0]:el[1]]))
                        i = endr
                        continue
                else:
                    se = scalar_literal_end(endl + 1)
                    if se is not None:
                        out += _splice(
                            "array_append(__ARR__, __EL__)",
                            arr=_pass_array_ops(tokens[i:endl]),
                            el=list(tokens[endl + 1:se]))
                        i = se
                        continue
        else:
            # scalar literal || ARRAY literal → prepend
            se = scalar_literal_end(i)
            if se is not None and se < n and tokens[se].text == "||":
                rc = _array_comparand(tokens, se + 1)
                if rc is not None:
                    endr, _ = rc
                    out += _splice(
                        "array_prepend(__ARR__, __EL__)",
                        arr=_pass_array_ops(tokens[se + 1:endr]),
                        el=list(tokens[i:se]))
                    i = endr
                    continue
        out.append(tokens[i])
        i += 1
    return out


def _pass_case_when_null(tokens: list[Tok]) -> list[Tok]:
    """``CASE WHEN NULL THEN …`` — the reference types a bare NULL
    condition as boolean (never matches); Spark rejects the VOID type.
    Pin the cast."""
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.is_kw("WHEN") and i + 2 < n and tokens[i + 1].is_kw("NULL") \
                and tokens[i + 2].is_kw("THEN"):
            out.append(t)
            out += tokenize("CAST(NULL AS BOOLEAN)")
            i += 2
            continue
        out.append(t)
        i += 1
    return out


def _pass_misc(tokens: list[Tok]) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        # GROUP BY () — the empty grouping (global aggregation): drop the
        # clause (SqlBase.g4 groupingElement '()'; Spark has no spelling)
        if (
            t.is_kw("GROUP") and i + 3 < n and tokens[i + 1].is_kw("BY")
            and tokens[i + 2].text == "(" and tokens[i + 3].text == ")"
        ):
            i += 4
            continue
        # GROUP BY DISTINCT [GROUPING SETS (...)] — deduplicate the sets
        # (Presto's setQuantifier on GROUP BY; Spark has none)
        if (
            t.is_kw("GROUP") and i + 2 < n and tokens[i + 1].is_kw("BY")
            and tokens[i + 2].is_kw("DISTINCT")
        ):
            out.extend([ident("GROUP"), ident("BY")])
            j = i + 3
            if (
                j + 2 < n and tokens[j].is_kw("GROUPING")
                and tokens[j + 1].is_kw("SETS") and tokens[j + 2].text == "("
            ):
                close = find_matching_paren(tokens, j + 2)
                sets = split_top_level(tokens[j + 3:close])
                seen, uniq = set(), []
                for s in sets:
                    key = " ".join(tok.text for tok in s)
                    if key not in seen:
                        seen.add(key)
                        uniq.append(s)
                out.extend([ident("GROUPING"), ident("SETS"), op("(")])
                for k, s in enumerate(uniq):
                    if k:
                        out.append(op(","))
                    out.extend(s)
                out.append(op(")"))
                i = close + 1
            else:
                i = j
            continue
        # WHERE NULL / HAVING NULL — an untyped NULL predicate is FALSE in
        # the reference; Spark rejects the untyped literal as a filter
        if (
            t.is_kw("WHERE", "HAVING") and i + 1 < n
            and tokens[i + 1].is_kw("NULL")
            and (i + 2 >= n or tokens[i + 2].kind == "ident"
                 or tokens[i + 2].text in (")", ";"))
            and not (i + 2 < n and tokens[i + 2].is_kw("IS", "IN", "AND",
                                                       "OR", "NOT"))
        ):
            out.extend([t, ident("CAST"), op("("), ident("NULL"),
                        ident("AS"), ident("BOOLEAN"), op(")")])
            i += 2
            continue
        # TABLESAMPLE BERNOULLI(p) / SYSTEM(p) → TABLESAMPLE (p PERCENT)
        if (
            t.is_kw("TABLESAMPLE") and i + 1 < n
            and tokens[i + 1].is_kw("BERNOULLI", "SYSTEM")
            and i + 2 < n and tokens[i + 2].text == "("
        ):
            close = find_matching_paren(tokens, i + 2)
            pct = tokens[i + 3:close]
            out.extend([ident("TABLESAMPLE"), op("(")] + pct +
                       [ident("PERCENT"), op(")")])
            i = close + 1
            continue
        # FETCH FIRST|NEXT n ROWS ONLY → LIMIT n
        if t.is_kw("FETCH") and i + 4 < n and tokens[i + 1].is_kw("FIRST", "NEXT"):
            out.extend([ident("LIMIT"), tokens[i + 2]])
            i += 5  # FETCH FIRST n ROWS ONLY
            continue
        # LIMIT ALL → (drop)
        if t.is_kw("LIMIT") and i + 1 < n and tokens[i + 1].is_kw("ALL"):
            i += 2
            continue
        # bare LOCALTIMESTAMP keyword → Spark's function spelling
        if t.is_kw("LOCALTIMESTAMP") and not (i + 1 < n and tokens[i + 1].text == "("):
            out.extend([ident("localtimestamp"), op("("), op(")")])
            i += 1
            continue
        out.append(t)
        i += 1
    return out


# Presto extract() fields with different Spark spellings: DOW/DAY_OF_WEEK
# are ISO (Mon=1..Sun=7, DateTimeFunctions.java) — Spark's bare DOW is
# Sunday-based; YOW is the ISO week-year.
_EXTRACT_FIELD = {
    "DOW": "DAYOFWEEK_ISO",
    "DAY_OF_WEEK": "DAYOFWEEK_ISO",
    "YOW": "YEAROFWEEK",
    "YEAR_OF_WEEK": "YEAROFWEEK",
    "DOY": "DOY",
}


def _pass_extract_fields(tokens: list[Tok]) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if (
            t.is_kw("EXTRACT") and i + 2 < n and tokens[i + 1].text == "("
            and tokens[i + 2].kind == "ident"
            and tokens[i + 2].upper in _EXTRACT_FIELD
        ):
            out.extend([t, tokens[i + 1], ident(_EXTRACT_FIELD[tokens[i + 2].upper])])
            i += 3
            continue
        out.append(t)
        i += 1
    return out


def _pass_create_table_props(tokens: list[Tok]) -> list[Tok]:
    """CREATE TABLE t WITH (format=…, partitioned_by=…, bucketed_by=…,
    bucket_count=…) AS — the reference's table-property syntax
    (HiveTableProperties.java) → Spark's USING / PARTITIONED BY /
    CLUSTERED BY clauses.  Unknown properties fail loudly."""
    if not (len(tokens) > 2 and tokens[0].is_kw("CREATE") and tokens[1].is_kw("TABLE")):
        return tokens
    i = 2
    n = len(tokens)
    while i < n and not tokens[i].is_kw("WITH", "AS", "("):
        i += 1
    if i >= n or not tokens[i].is_kw("WITH") or tokens[i + 1].text != "(":
        return tokens
    close = find_matching_paren(tokens, i + 1)
    props: dict[str, list[Tok]] = {}
    for part in split_top_level(tokens[i + 2:close]):
        eq = next(k for k, t in enumerate(part) if t.text == "=")
        props[part[0].text.lower()] = part[eq + 1:]
    clauses: list[Tok] = []
    fmt = props.pop("format", None)
    clauses += [ident("USING"), ident(string_value(fmt[0]) if fmt else "parquet")]

    def cols(v: list[Tok]) -> list[Tok]:
        # ARRAY['a','b'] → a, b
        out_c: list[Tok] = []
        for t in v:
            if t.kind == "string":
                if out_c:
                    out_c.append(op(","))
                out_c.append(ident(string_value(t)))
        return out_c

    if "partitioned_by" in props:
        clauses += [ident("PARTITIONED"), ident("BY"), op("(")] + cols(props.pop("partitioned_by")) + [op(")")]
    if "bucketed_by" in props:
        clauses += [ident("CLUSTERED"), ident("BY"), op("(")] + cols(props.pop("bucketed_by")) + [op(")")]
        count = props.pop("bucket_count", [Tok("number", "8")])
        clauses += [ident("INTO")] + count + [ident("BUCKETS")]
    if props:
        raise ValueError(f"unsupported table properties: {sorted(props)}")
    return tokens[:i] + clauses + tokens[close + 1:]


def _pass_create_view(tokens: list[Tok]) -> list[Tok]:
    """CREATE [OR REPLACE] VIEW → CREATE OR REPLACE TEMPORARY VIEW: the
    engine's parquet-dir catalog is session-scoped temp views, and Spark
    refuses persistent views over temp relations.  (Presto views persist
    in the metastore — session-scoped is the honest equivalent here.)"""
    k = 0
    if len(tokens) > 1 and tokens[0].is_kw("CREATE"):
        k = 1
        if len(tokens) > 3 and tokens[1].is_kw("OR") and tokens[2].is_kw("REPLACE"):
            k = 3
        if tokens[k].is_kw("VIEW"):
            return [ident("CREATE"), ident("OR"), ident("REPLACE"),
                    ident("TEMPORARY"), ident("VIEW")] + tokens[k + 1:]
    return tokens


def _pass_catalog_qualifier(tokens: list[Tok]) -> list[Tok]:
    """Drop the catalog level from three-part table identifiers.

    The reference addresses tables as catalog.schema.table
    (ConnectorMetadata's Catalog → Schema → Table); Spark's session
    catalog has only schema.table.  Conservatively rewrite only names in
    table position — the identifier chain immediately after FROM or JOIN —
    so struct-field paths (col.field.sub) elsewhere are untouched.
    """
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        out.append(t)
        if t.is_kw("FROM", "JOIN") and i + 5 < n and all(
            tokens[i + k].kind in ("ident", "qident") for k in (1, 3, 5)
        ) and tokens[i + 2].text == "." and tokens[i + 4].text == "." and not (
            i + 6 < n and tokens[i + 6].text == "."
        ):
            out.extend([tokens[i + 3], tokens[i + 4], tokens[i + 5]])
            i += 6
            continue
        i += 1
    return out


# the two geometry aggregates whose naive spelling collects a whole
# group into one array (geo_fns.geometry_union_agg / convex_hull_agg)
_GEO_2P_AGGS = {"geometry_union_agg", "convex_hull_agg"}
# aggregates with an exact partial/merge decomposition the two-phase
# rewrite knows how to spell (besides the geo pair)
_GEO_2P_SIMPLE = {"sum", "min", "max", "bool_and", "bool_or", "every",
                  "arbitrary", "any_value"}
# recognizable aggregate names with NO simple decomposition — their
# presence next to a two-phase trigger aborts the rewrite (single-phase
# fallback keeps correctness; only scale suffers)
_GEO_2P_OTHER_AGGS = {
    "avg", "stddev", "stddev_pop", "stddev_samp", "variance", "var_pop",
    "var_samp", "skewness", "kurtosis", "corr", "covar_pop", "covar_samp",
    "regr_intercept", "regr_slope", "array_agg", "map_agg", "map_union",
    "multimap_agg", "histogram", "numeric_histogram", "approx_distinct",
    "approx_percentile", "approx_set", "merge", "checksum",
    "geometric_mean", "bitwise_and_agg", "bitwise_or_agg",
    "set_agg", "set_union", "min_by", "max_by", "count_if", "listagg",
    "qdigest_agg", "merge_qdigest", "learn_classifier",
    "learn_libsvm_classifier", "spatial_partitioning", "collect_list",
    "collect_set", "first", "last", "percentile_approx", "grouping",
    "make_set_digest", "merge_set_digest",
}

# aggregates whose single-phase spelling materializes a whole group in
# one task AND that merge exactly — their presence alone triggers the
# two-phase restructure (the geo pair, the TypedHeap top-n forms, and
# reduce_agg whose combine_fn exists precisely for partial-state merge)
_GEO_2P_TRIGGERS = _GEO_2P_AGGS | {"reduce_agg", "min_n", "max_n"}


def _strip_outer_parens(seg: list[Tok]) -> list[Tok]:
    while len(seg) >= 2 and seg[0].text == "(" \
            and find_matching_paren(seg, 0) == len(seg) - 1:
        seg = seg[1:-1]
    return seg


def _reduce_agg_identity_init(init: list[Tok], combine: list[Tok]) -> bool:
    """True when ``init`` is PROVABLY the identity of ``combine`` for the
    recognized combine shapes ``(a, b) -> a (+|*|AND|OR) b``.  The
    reference seeds initialState once per partial aggregation state and
    its combine never re-seeds (ReduceAggregationFunction.java:162-216),
    so the two-phase restructure is only exact — i.e. only matches the
    single-state fold — when combining with init is a no-op.  Anything
    unrecognized answers False and the caller keeps the single-phase
    spelling (correct for every init, just not the 100-TB shape)."""
    lam = _strip_outer_parens(list(combine))
    # params: (a, b) ->
    if not lam or lam[0].text != "(":
        return False
    close = find_matching_paren(lam, 0)
    params = [t.text.lower() for t in lam[1:close] if t.kind == "ident"]
    if len(params) != 2 or close + 1 >= len(lam) \
            or lam[close + 1].text != "->":
        return False
    body = _strip_outer_parens(lam[close + 2:])
    # unwrap one CAST(body AS type)
    if len(body) >= 4 and body[0].is_kw("CAST") and body[1].text == "(" \
            and find_matching_paren(body, 1) == len(body) - 1:
        inner = body[2:-1]
        k = next((j for j in range(len(inner))
                  if inner[j].is_kw("AS")), None)
        if k is not None:
            body = _strip_outer_parens(inner[:k])
    if len(body) != 3 or body[0].kind != "ident" or body[2].kind != "ident":
        return False
    if {body[0].text.lower(), body[2].text.lower()} != set(params):
        return False
    op_t = body[1]
    ini = _strip_outer_parens(list(init))
    # unwrap CAST(lit AS type) on the init too
    if len(ini) >= 4 and ini[0].is_kw("CAST") and ini[1].text == "(" \
            and find_matching_paren(ini, 1) == len(ini) - 1:
        inner = ini[2:-1]
        k = next((j for j in range(len(inner))
                  if inner[j].is_kw("AS")), None)
        if k is not None:
            ini = _strip_outer_parens(inner[:k])
    neg = False
    if len(ini) == 2 and ini[0].text in ("-", "+"):
        neg = ini[0].text == "-"
        ini = ini[1:]
    if len(ini) != 1:
        return False
    lit = ini[0]
    if op_t.text in ("+", "*"):
        if lit.kind != "number":
            return False
        try:
            v = float(lit.text)
        except ValueError:
            return False
        if neg:
            v = -v
        return v == 0.0 if op_t.text == "+" else v == 1.0
    if op_t.is_kw("AND"):
        return lit.is_kw("TRUE") and not neg
    if op_t.is_kw("OR"):
        return lit.is_kw("FALSE") and not neg
    return False


def _geo2p_scan_aggs(seg: list[Tok]):
    """Yield (start, end, name, args, filter_pred) for every decomposable
    aggregate call in ``seg``, skipping paren groups that hold their own
    SELECT (subqueries own their aggregates).  A trailing
    ``FILTER (WHERE pred)`` is captured as filter_pred (token list, None
    when absent) with ``end`` covering the whole clause: the partial
    phase applies the filter per-row (CASE projection) and the merge is
    unconditional — AggregationNode's per-arm mask semantics.  Returns
    None to signal an aborting construct: an OVER clause, a stray
    FILTER, a DISTINCT argument, a multi-arg min/max/count, or a known
    non-decomposable aggregate."""
    found = []
    i = 0
    n = len(seg)
    while i < n:
        t = seg[i]
        if t.text == "(":
            close = find_matching_paren(seg, i)
            inner = seg[i + 1:close]
            if any(x.is_kw("SELECT") for x in _depth0_iter(inner)):
                i = close + 1  # subquery: its aggregates are its own
                continue
            sub = _geo2p_scan_aggs(inner)
            if sub is None:
                return None
            found += [(i + 1 + a, i + 1 + b, nm, ar, fp)
                      for a, b, nm, ar, fp in sub]
            i = close + 1
            continue
        if t.is_kw("OVER", "FILTER"):
            return None
        if t.kind == "ident" and i + 1 < n and seg[i + 1].text == "(":
            name = t.text.lower()
            if name in _GEO_2P_OTHER_AGGS:
                return None
            if name in _GEO_2P_AGGS or name in _GEO_2P_SIMPLE \
                    or name in ("count", "reduce_agg"):
                close = find_matching_paren(seg, i + 1)
                args = seg[i + 2:close]
                end = close
                fpred: list[Tok] | None = None
                if close + 1 < n and seg[close + 1].is_kw("FILTER"):
                    # FILTER ( WHERE pred )
                    if close + 3 >= n or seg[close + 2].text != "(" \
                            or not seg[close + 3].is_kw("WHERE"):
                        return None
                    fclose = find_matching_paren(seg, close + 2)
                    fpred = seg[close + 4:fclose]
                    if not fpred:
                        return None
                    end = fclose
                if args and args[0].is_kw("DISTINCT"):
                    return None
                if fpred is not None and name in ("arbitrary", "any_value"):
                    # the per-row CASE filter leans on NULL-skipping;
                    # Spark's any_value keeps NULLs — single-phase
                    return None
                argv = split_top_level(args) if args else []
                if name == "count" and len(argv) == 1 \
                        and args[0].text == "*":
                    found.append((i, end, "count*", [], fpred))
                elif name == "reduce_agg" and len(argv) == 4:
                    # Exact two-phase needs the initial state to be a
                    # combine identity: the reference seeds initialState
                    # once per partial state and combine() never
                    # re-seeds (ReduceAggregationFunction.java:162-216),
                    # so a non-identity init would be counted once per
                    # partition.  Only rewrite when init is PROVABLY the
                    # identity of a recognized combine shape; otherwise
                    # the whole level keeps the single-phase spelling.
                    if not _reduce_agg_identity_init(argv[1], argv[3]):
                        return None
                    found.append((i, end, "reduce_agg", argv, fpred))
                elif name in ("min", "max") and len(argv) == 2:
                    # min(x, n)/max(x, n): top-n array (TypedHeap);
                    # mergeable only when n is a plain literal
                    if len(argv[1]) != 1 or argv[1][0].kind != "number":
                        return None
                    found.append((i, end, f"{name}_n", argv, fpred))
                elif len(argv) == 1 and args:
                    found.append((i, end, name, argv, fpred))
                else:
                    return None  # unknown arity: keep single-phase
                i = end + 1
                continue
        i += 1
    return found


def _depth0_iter(seg: list[Tok]):
    """Tokens of ``seg`` at its own paren depth."""
    j = 0
    while j < len(seg):
        if seg[j].text == "(":
            j = find_matching_paren(seg, j) + 1
            continue
        yield seg[j]
        j += 1


def _pass_two_phase_geo_agg(tokens: list[Tok]) -> list[Tok]:
    """geometry_union_agg / convex_hull_agg → exact two-phase aggregation.

    The reference's accumulators (presto-geospatial aggregation/
    GeometryUnionAgg.java, ConvexHullAggregation.java) keep bounded
    per-task state; the naive Spark spelling — a scalar over
    collect_list(g) — materializes every geometry of a group in ONE
    task, which OOMs a hot group at scale.  Union and convex hull are
    both exactly mergeable (union of partial unions, hull of partial
    hulls), so qualifying aggregate blocks are respelled as:

      phase 1  group by (keys…, spark_partition_id()) — each subgroup
               lives entirely inside one input partition, so the
               collected array is bounded by spark.sql.files
               .maxPartitionBytes no matter how hot the key;
      phase 2  group by (keys…) over ≤ numPartitions partials per key.

    The union merge sorts partials by their source partition id so the
    result is deterministic and matches the single-phase row order.

    The same restructure triggers for the OTHER single-array aggregates
    with an exact merge: min(x, n)/max(x, n) (TypedHeap — the top-n of
    pooled per-partition top-ns is the global top-n) and reduce_agg
    (ReduceAggregationFunction — partial folds with the input lambda
    merge with the COMBINE lambda, the distributed contract that
    parameter exists for).  Other aggregates in the same SELECT are
    decomposed alongside (count→sum of counts, sum/min/max/bool_*→
    same-function merge).  Since round 10, FILTER (WHERE …) decomposes
    per-arm — the filter becomes a per-row CASE in the inner projection
    (the reference's per-arm input mask) and the merge stays
    unconditional — and HAVING decomposes as an outer filter whose
    aggregates get the same partial/merge treatment (the reference's
    AggregationNode → FilterNode shape).  Since round 11, GROUP BY
    ordinals resolve to their select item before restructuring, and a
    bare qualified group-key ref in HAVING (t.k over a single-relation
    FROM) drops its qualifier.  The remaining single-phase fallbacks:
    an aggregate we can't decompose (incl. non-identity reduce_agg
    inits, where no exact decomposition exists —
    ReduceAggregationFunction.java:162-216), DISTINCT arguments,
    windows, set-op levels, and multi-relation qualified refs in
    HAVING — correct, just not the 100-TB shape.
    """
    trigger_names = _GEO_2P_AGGS | {"reduce_agg", "min", "max"}
    if not any(t.kind == "ident" and t.text.lower() in trigger_names
               for t in tokens):
        return tokens
    # rewrite inner subqueries first
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.text == "(":
            close = find_matching_paren(tokens, i)
            out += [t] + _pass_two_phase_geo_agg(tokens[i + 1:close]) \
                + [tokens[close]]
            i = close + 1
            continue
        out.append(t)
        i += 1
    tokens = out
    new = _geo2p_rewrite_level(tokens)
    return new if new is not None else tokens


def _replace_key_expr(seg: list[Tok], pattern: list[Tok],
                      alias: Tok) -> list[Tok]:
    """Replace every occurrence of the key-expression token sequence
    (bare or parenthesized) with its mid-exposed alias, skipping paren
    groups that hold their own SELECT (inner scopes own their names).
    Token-sequence matching is exact up to identifier case."""
    if not seg:
        return seg
    variants = [pattern, [op("(")] + pattern + [op(")")]]
    out: list[Tok] = []
    i = 0
    n = len(seg)
    while i < n:
        t = seg[i]
        if t.text == "(":
            close = find_matching_paren(seg, i)
            inner = seg[i + 1:close]
            if any(x.is_kw("SELECT") for x in _depth0_iter(inner)):
                out += seg[i:close + 1]
                i = close + 1
                continue
        matched = False
        for pat in variants:
            m = len(pat)
            if i + m <= n and all(
                    seg[i + k].kind == pat[k].kind
                    and seg[i + k].upper == pat[k].upper
                    for k in range(m)):
                out.append(alias)
                i += m
                matched = True
                break
        if not matched:
            out.append(t)
            i += 1
    return out


def _geo2p_rewrite_level(tokens: list[Tok]) -> list[Tok] | None:
    """Rewrite THIS level's SELECT block (subqueries already handled).
    Returns None when the level doesn't qualify."""
    # trigger aggregate still present outside any subquery at this level?
    probe = _geo2p_scan_aggs(tokens)
    if probe is None or not any(nm in _GEO_2P_TRIGGERS
                                for _, _, nm, _, _ in probe):
        return None
    # clause indices at this level's depth 0
    idx: dict[str, int] = {}
    j = 0
    n = len(tokens)
    while j < n:
        t = tokens[j]
        if t.text == "(":
            j = find_matching_paren(tokens, j) + 1
            continue
        if t.kind == "ident":
            u = t.upper
            if u in ("SELECT", "FROM", "WHERE", "GROUP", "HAVING",
                     "ORDER", "LIMIT") and u not in idx:
                idx[u] = j
            if u in ("UNION", "INTERSECT", "EXCEPT"):
                return None  # set-op level: keep single-phase
        j += 1
    if "SELECT" not in idx or "FROM" not in idx:
        return None
    sel_i, from_i = idx["SELECT"], idx["FROM"]
    if not sel_i < from_i:
        return None
    if tokens[sel_i + 1].is_kw("DISTINCT"):
        return None
    bounds = sorted(v for k, v in idx.items() if v > from_i)
    from_end = bounds[0] if bounds else n
    where_i = idx.get("WHERE")
    where_end = min((b for b in bounds if where_i is not None
                     and b > where_i), default=n) if where_i else None
    group_i = idx.get("GROUP")
    if group_i is not None and not (group_i + 1 < n
                                    and tokens[group_i + 1].upper == "BY"):
        return None
    group_end = min((b for b in bounds if group_i is not None
                     and b > group_i), default=n) if group_i is not None else None
    having_i = idx.get("HAVING")
    having_end = min((b for b in bounds if having_i is not None
                      and b > having_i), default=n) \
        if having_i is not None else None
    tail_start = min((idx[k] for k in ("ORDER", "LIMIT") if k in idx),
                     default=n)
    if not (where_i is None or from_end == where_i):
        return None
    items = tokens[sel_i + 1:from_i]
    from_seg = tokens[from_i + 1:from_end]
    where_seg = tokens[where_i + 1:where_end] if where_i else []
    group_seg = tokens[group_i + 2:group_end] if group_i is not None else []
    having_seg = tokens[having_i + 1:having_end] \
        if having_i is not None else []
    tail_seg = tokens[tail_start:]
    prefix = tokens[:sel_i]  # WITH clause, if any
    if not from_seg:
        return None
    # aggregates referenced by ORDER BY/LIMIT would read columns the
    # mid query doesn't expose — bail rather than fail downstream
    agg_names = _GEO_2P_AGGS | _GEO_2P_SIMPLE | _GEO_2P_OTHER_AGGS | {"count"}
    if any(t.kind == "ident" and t.text.lower() in agg_names
           for t in tail_seg):
        return None
    # group keys: bare identifiers pass through mid under their own
    # names; qualified refs and expressions (e.g. the spatial-binning
    # GROUP BY bing_tile(lat, lon, z) shape) compute ONCE in the inner
    # projection under a stable alias, and outer SELECT/HAVING/ORDER BY
    # references are token-sequence replaced by the alias.  The textual
    # replacement can miss a semantically-equal spelling — engine.sql
    # retries with two_phase=False if the restructured plan fails
    # analysis, so the miss surfaces as the (correct) single-phase plan.
    keys: list[Tok] = []
    expr_keys: list[tuple[list[Tok], Tok]] = []
    inner_key_cols: list[str] = []
    if group_seg:
        for ki, key in enumerate(split_top_level(group_seg)):
            key = _strip_outer_parens(key)
            if not key or any(t.is_kw("ROLLUP", "CUBE", "GROUPING")
                              for t in _depth0_iter(key)):
                return None
            if len(key) == 1 and key[0].kind == "number" \
                    and key[0].text.isdigit():
                # GROUP BY ordinal — resolve to the select item before
                # restructuring (the reference resolves ordinals during
                # analysis; Analyzer.java groupingElement positions)
                sel_items = split_top_level(items)
                oi = int(key[0].text) - 1
                if not (0 <= oi < len(sel_items)):
                    return None
                item = _strip_outer_parens(list(sel_items[oi]))
                if len(item) >= 3 and item[-2].is_kw("AS") \
                        and item[-1].kind in ("ident", "qident"):
                    item = item[:-2]
                key = _strip_outer_parens(item)
                if not key:
                    return None
            if len(key) == 1 and key[0].kind in ("ident", "qident"):
                keys.append(key[0])
                inner_key_cols.append(render([key[0]]))
            elif len(key) == 1:
                return None  # GROUP BY literal
            else:
                if any(t.kind == "ident" and t.text.lower() in agg_names
                       for t in key) \
                        or any(x.is_kw("SELECT") for x in key):
                    return None
                alias = ident(f"__fps_k{ki}")
                keys.append(alias)
                expr_keys.append((list(key), alias))
                inner_key_cols.append(f"{render(key)} AS __fps_k{ki}")
    aggs = _geo2p_scan_aggs(items)
    if aggs is None or not aggs:
        return None
    # HAVING decomposes as an OUTER filter: its aggregates get the same
    # partial/merge treatment as select-list ones (extra mid columns),
    # and the rewritten predicate applies after the merge — exactly the
    # reference's plan shape (AggregationNode → FilterNode).  Qualified
    # column refs can't be resolved through the mid projection — bail.
    h_aggs: list = []
    if having_seg:
        h_spans = _geo2p_scan_aggs(having_seg)
        if h_spans is None:
            return None
        # bare qualified group-key refs (t.k) resolve through the mid
        # projection only under their unqualified name — strip the
        # qualifier when it names the single FROM relation; any other
        # dotted shape bails to single-phase
        rel_alias = _single_relation_alias(from_seg)
        new_h: list[Tok] = []
        hj = 0
        while hj < len(having_seg):
            if any(s <= hj <= e for s, e, *_ in h_spans):
                new_h.append(having_seg[hj])
                hj += 1
                continue
            t = having_seg[hj]
            if t.kind in ("ident", "qident") \
                    and hj + 2 < len(having_seg) \
                    and having_seg[hj + 1].text == "." \
                    and having_seg[hj + 2].kind in ("ident", "qident"):
                if rel_alias is not None \
                        and t.text.strip('"').lower() == rel_alias.lower():
                    new_h.append(having_seg[hj + 2])
                    hj += 3
                    continue
                return None
            if t.text == ".":
                return None
            new_h.append(t)
            hj += 1
        having_seg = new_h
        h_aggs = _geo2p_scan_aggs(having_seg)
        if h_aggs is None:
            return None
    # build the three layers
    k_sql = ", ".join(render([k]) for k in keys)
    inner_cols = list(inner_key_cols)
    mid_cols: list[str] = []
    merges: list[str] = []
    n_sel = len(aggs)
    for i, (_s, _e, name, argv, fpred) in enumerate(aggs + h_aggs):
        a, g = f"__fps_a{i}", f"__fps_gp{i}"
        if fpred is not None:
            # FILTER (WHERE pred): applied per-row in the inner
            # projection — excluded rows become NULL, which every
            # aggregate here skips exactly like the reference's
            # per-arm input mask; the merge stays unconditional
            p_sql = render(fpred)
            if name == "count*":
                # count(*) counts rows passing the filter
                name = "count"
                argv = [tokenize("1")]
            v_sql = render(argv[0])
            inner_cols.append(
                f"(CASE WHEN {p_sql} THEN {v_sql} END) AS {a}")
        elif name != "count*":
            inner_cols.append(f"{render(argv[0])} AS {a}")
        if name == "geometry_union_agg":
            mid_cols.append(f"geometry_union(collect_list({a})) AS {g}")
            merges.append(
                "geometry_union(transform(array_sort(collect_list("
                f"named_struct('s', __fps_salt, 'g', {g}))), x -> x.g))")
        elif name == "convex_hull_agg":
            mid_cols.append(
                f"presto_convex_hull_of_collection(collect_list({a})) AS {g}")
            merges.append(
                f"presto_convex_hull_of_collection(collect_list({g}))")
        elif name == "count*":
            mid_cols.append(f"count(*) AS {g}")
            merges.append(f"CAST(coalesce(sum({g}), 0) AS BIGINT)")
        elif name == "count":
            mid_cols.append(f"count({a}) AS {g}")
            merges.append(f"CAST(coalesce(sum({g}), 0) AS BIGINT)")
        elif name in ("min_n", "max_n"):
            # TypedHeap top-n: the partial is the fallback rule's own
            # spelling over the subgroup; the merge re-selects the top n
            # of ≤ n·numPartitions pooled candidates — exact (top-n of
            # unioned top-ns is the global top-n, ties kept as values).
            # Zero non-null inputs → NULL, not [] (AbstractMinMaxN
            # AggregationFunction.output:148 appendNull on empty heap);
            # partials stay [] so flatten pools them cheaply.
            asc = "true" if name == "min_n" else "false"
            n_lit = argv[1][0].text
            mid_cols.append(
                f"slice(sort_array(collect_list({a}), {asc}), 1, {n_lit})"
                f" AS {g}")
            merges.append(
                f"nullif(slice(sort_array(flatten(collect_list({g})), "
                f"{asc}), 1, {n_lit}), array())")
        elif name == "reduce_agg":
            # ReduceAggregationFunction: fold the subgroup with the
            # input lambda from the initial state; merge the partial
            # states with the COMBINE lambda — the exact distributed
            # contract the reference's combine function exists for.
            # RULES["reduce_agg"] supplies the fallback's aggregate()
            # spelling (including its accumulator-type coercion).  The
            # merge fold is seeded with the FIRST partial, not the
            # initial state — the reference's combine never re-seeds
            # (ReduceAggregationFunction.java:189-216), and re-applying
            # init here would count it twice.  (The rewrite only
            # triggers when init is a provable combine identity — see
            # _reduce_agg_identity_init — since each per-partition
            # partial already folds from init once.)
            partial = render(RULES["reduce_agg"](
                [[ident(a)], argv[1], argv[2], argv[3]]))
            comb = render(argv[3])
            ps = f"collect_list({g})"
            # greatest(…, 0): every partial can be NULL (a FILTER that
            # excludes a whole group), leaving ps empty — slice errors
            # on a negative length
            merge = (f"aggregate(slice({ps}, 2, "
                     f"greatest(size({ps}) - 1, 0)), "
                     f"element_at({ps}, 1), {comb})")
            mid_cols.append(f"{partial} AS {g}")
            merges.append(merge)
        else:  # sum/min/max/bool_and/bool_or/every/arbitrary/any_value
            mid_cols.append(f"{name}({a}) AS {g}")
            merges.append(f"{name}({g})")
    inner_cols.append("spark_partition_id() AS __fps_salt")
    inner = f"SELECT {', '.join(inner_cols)} FROM {render(from_seg)}"
    if where_seg:
        inner += f" WHERE {render(where_seg)}"
    mid_keys = (k_sql + ", " if keys else "") + "__fps_salt"
    mid = (f"SELECT {mid_keys}, {', '.join(mid_cols)} "
           f"FROM ( {inner} ) GROUP BY {mid_keys}")
    # outer select list: original items with each aggregate call span
    # replaced by its merge expression (replace back-to-front so spans
    # stay valid); same substitution inside the HAVING predicate
    out_items = list(items)
    for (s, e, _nm, _ar, _fp), merge in sorted(zip(aggs, merges[:n_sel]),
                                               key=lambda p: -p[0][0]):
        out_items[s:e + 1] = tokenize(merge)
    out_having = list(having_seg)
    for (s, e, _nm, _ar, _fp), merge in sorted(zip(h_aggs, merges[n_sel:]),
                                               key=lambda p: -p[0][0]):
        out_having[s:e + 1] = tokenize(merge)
    out_tail = list(tail_seg)
    for pat, alias in expr_keys:
        out_items = _replace_key_expr(out_items, pat, alias)
        out_having = _replace_key_expr(out_having, pat, alias)
        out_tail = _replace_key_expr(out_tail, pat, alias)
    outer = f"SELECT {render(out_items)} FROM ( {mid} )"
    if keys:
        outer += f" GROUP BY {k_sql}"
    if out_having:
        outer += f" HAVING {render(out_having)}"
    if out_tail:
        outer += " " + render(out_tail)
    return prefix + tokenize(outer)


def translate(sql: str, *, two_phase: bool = True) -> str:
    """Presto-dialect SQL → Spark-SQL string.

    ``two_phase=False`` skips the bounded-state aggregate restructure
    (engine.sql retries with it off if the restructured plan fails
    analysis — the expression-group-key replacement is textual and can
    miss a semantically-equal reference)."""
    toks = tokenize(sql)
    toks = _pass_create_table_props(toks)
    toks = _pass_create_view(toks)
    toks = _pass_catalog_qualifier(toks)
    toks = _pass_extract_fields(toks)
    toks = _pass_time_arith(toks)
    toks = _pass_ieee_division(toks)
    toks = _pass_tz_literals(toks)
    toks = _pass_typed_literals(toks)
    toks = _pass_unnest(toks)
    toks = _pass_lateral_join_fixup(toks)
    toks = _pass_values_lambda(toks)
    toks = _pass_map_in(toks)
    toks = _pass_real_decimal_coercion(toks)
    toks = _pass_char_semantics(toks)
    toks = _pass_cast_types(toks)
    toks = _pass_subscript(toks)
    toks = _pass_quantified(toks)
    toks = _pass_exists_no_from(toks)
    toks = _pass_collapse_trivial_derived(toks)
    toks = _pass_scalar_no_from(toks)
    toks = _pass_join_on_subquery(toks)
    toks = _pass_hoist_grouped_csq(toks)
    toks = _pass_using_wildcard(toks)
    toks = _pass_projected_in(toks)
    toks = _pass_window_compat(toks)
    toks = _pass_in_values(toks)
    toks = _pass_order_by_grouping(toks)
    toks = _pass_gs_empty_global(toks)
    toks = _pass_cube_rollup_empty_global(toks)
    toks = _pass_grouping_sets_for_grouping_fn(toks)
    toks = _pass_map_equality(toks)
    toks = _pass_array_ops(toks)
    if two_phase:
        toks = _pass_two_phase_geo_agg(toks)
    toks = _pass_functions(toks)
    toks = _pass_at_time_zone(toks)
    toks = _pass_like_escape(toks)
    toks = _pass_case_when_null(toks)
    toks = _pass_misc(toks)
    toks = _pass_order_by_nulls(toks)
    return render(toks)
