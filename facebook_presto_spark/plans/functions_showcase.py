"""Function-library showcase queries — every expression goes through the
registry (``functions.call``), so these verify the function layer end-to-end
against DuckDB, mirroring the reference's per-function test suites
(presto-main/src/test/.../operator/scalar/TestStringFunctions.java,
TestMathFunctions.java, TestDateTimeFunctions.java, …).

Functions without a faithful DuckDB twin (from_base/to_base, normalize,
hmac_*, url_encode, date_diff month semantics, MySQL %-formats beyond the
C-compatible subset) are covered in tests/test_functions.py instead —
DuckDB would be a *wrong* oracle for some of them (e.g. DuckDB's
date_diff counts boundary crossings; the reference counts fully-elapsed
units).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from facebook_presto_spark.functions import call
from facebook_presto_spark.plans.tpch import _t


def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    t = F.col("text")
    return docs.select(
        "doc_id",
        call("length", t).cast("bigint").alias("len"),
        call("upper", call("substr", t, 1, 10)).alias("head_upper"),
        call("split_part", t, " ", 2).alias("second_token"),
        call("strpos", t, "data").alias("data_pos"),
        call("lpad", call("substr", t, 1, 5), 8, ".").alias("padded"),
        call("reverse", call("substr", t, 1, 6)).alias("rev_head"),
        call("levenshtein_distance", call("split_part", t, " ", 1), F.lit("data")).alias("lev_to_data"),
        call("replace", call("substr", t, 1, 20), "a", "@").alias("replaced"),
        call("translate", call("substr", t, 1, 20), "aeiou", "AEIOU").alias("translated"),
        call("codepoint", call("substr", t, 1, 1)).cast("bigint").alias("first_cp"),
        call("concat", F.lit("doc:"), call("split_part", t, " ", 1)).alias("tagged"),
        call("starts_with", t, F.lit("key")).alias("starts_key"),
        call("regexp_extract", t, "([a-z]+) ([a-z]+)", 2).alias("re_second"),
        call("regexp_count", t, "data").cast("bigint").alias("data_count"),
    )


FN_STRING_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS len,
       upper(substr(text, 1, 10)) AS head_upper,
       split_part(text, ' ', 2) AS second_token,
       CAST(strpos(text, 'data') AS BIGINT) AS data_pos,
       lpad(substr(text, 1, 5), 8, '.') AS padded,
       reverse(substr(text, 1, 6)) AS rev_head,
       CAST(levenshtein(split_part(text, ' ', 1), 'data') AS BIGINT) AS lev_to_data,
       replace(substr(text, 1, 20), 'a', '@') AS replaced,
       translate(substr(text, 1, 20), 'aeiou', 'AEIOU') AS translated,
       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_cp,
       'doc:' || split_part(text, ' ', 1) AS tagged,
       starts_with(text, 'key') AS starts_key,
       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS re_second,
       CAST(length(text) - length(replace(text, 'data', 'dat')) AS BIGINT) AS data_count
FROM documents WHERE doc_id < 50
"""


def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        call("abs", -q).alias("abs_q"),
        call("ceil", p / 100.0).cast("bigint").alias("ceil_p"),
        call("floor", p / 100.0).cast("bigint").alias("floor_p"),
        call("round", p / 7.0, 2).alias("round_p"),
        call("sqrt", q).alias("sqrt_q"),
        # cbrt: JVM vs DuckDB differ in the last ulp → rounded for the oracle
        F.round(call("cbrt", q), 6).alias("cbrt_q"),
        F.round(call("exp", call("ln", q)), 6).alias("exp_ln_q"),
        F.round(call("log10", p), 8).alias("log10_p"),  # transcendental: last-ulp engine variance
        call("power", q, 2).alias("q_sq"),
        call("mod", F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("ok_mod7"),
        call("sign", F.col("l_discount") - 0.05).alias("disc_sign"),
        call("greatest", q, F.lit(25.0)).alias("q_hi"),
        call("least", q, F.lit(25.0)).alias("q_lo"),
        call("truncate", p / 7.0, 1).alias("trunc_p"),
        call("bitwise_and", F.col("l_orderkey"), F.lit(255)).alias("ok_and"),
        call("bit_count", F.col("l_linenumber")).cast("bigint").alias("ln_bits"),
    )


FN_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(-l_quantity) AS abs_q,
       CAST(ceil(l_extendedprice / 100.0) AS BIGINT) AS ceil_p,
       CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS floor_p,
       round(l_extendedprice / 7.0, 2) AS round_p,
       sqrt(l_quantity) AS sqrt_q,
       round(cbrt(l_quantity), 6) AS cbrt_q,
       round(exp(ln(l_quantity)), 6) AS exp_ln_q,
       round(log10(l_extendedprice), 8) AS log10_p,
       pow(l_quantity, 2) AS q_sq,
       CAST(l_orderkey % 7 AS BIGINT) AS ok_mod7,
       CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS disc_sign,
       greatest(l_quantity, 25.0) AS q_hi,
       least(l_quantity, 25.0) AS q_lo,
       (CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice/7.0*10) ELSE ceil(l_extendedprice/7.0*10) END)/10.0 AS trunc_p,
       l_orderkey & 255 AS ok_and,
       CAST(bit_count(l_linenumber) AS BIGINT) AS ln_bits
FROM lineitem WHERE l_orderkey < 100
"""


def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        call("year", d).alias("y"),
        call("quarter", d).alias("q"),
        call("month", d).alias("m"),
        call("day", d).alias("dom"),
        call("day_of_week", d).alias("isodow"),
        call("day_of_year", d).alias("doy"),
        call("week", d).alias("woy"),
        call("date_trunc", "month", d).alias("month_start"),
        call("date_add", "month", 3, d).alias("plus3m"),
        call("date_add", "day", -7, d).alias("minus7d"),
        call("date_diff", "day", d, F.lit("2000-01-01").cast("timestamp")).alias("days_to_y2k"),
        call("date_format", d, "%Y-%m-%d").alias("fmt"),
        call("to_unixtime", d).alias("epoch_s"),
        call("last_day_of_month", d).cast("timestamp").alias("month_end"),
    )


FN_DATETIME_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 3 MONTH AS plus3m,
       o_orderdate - INTERVAL 7 DAY AS minus7d,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT) AS days_to_y2k,
       strftime(o_orderdate, '%Y-%m-%d') AS fmt,
       CAST(epoch(o_orderdate) AS DOUBLE) AS epoch_s,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
FROM orders WHERE o_orderkey < 200
"""


def fn_json_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    from facebook_presto_spark.catalog import events_table

    ev = events_table(spark, sf_dir).filter(F.col("event_id") < 500)
    url = F.concat(
        F.lit("https://example.com/app/"),
        F.col("event_type"),
        F.lit("?uid="),
        F.col("user_id").cast("string"),
        F.lit("&x=1#frag"),
    )
    return ev.select(
        "event_id",
        call("json_extract_scalar", F.col("props"), "$.k").cast("bigint").alias("k_val"),
        call("is_json_scalar", F.col("props")).alias("props_is_scalar"),
        call("url_extract_protocol", url).alias("proto"),
        call("url_extract_host", url).alias("host"),
        call("url_extract_path", url).alias("path"),
        call("url_extract_query", url).alias("query"),
        call("url_extract_fragment", url).alias("fragment"),
        call("url_extract_parameter", url, "uid").cast("bigint").alias("uid_param"),
        call("to_hex", call("md5", F.col("event_type"))).alias("etype_md5"),
        call("to_hex", call("sha256", F.col("event_type"))).alias("etype_sha256"),
        call("to_hex", call("to_utf8", F.col("event_type"))).alias("etype_hex"),
        call("to_base64", call("to_utf8", F.col("event_type"))).alias("etype_b64"),
    )


FN_JSON_URL_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       NOT (trim(props) LIKE '[%' OR trim(props) LIKE '{%') AS props_is_scalar,
       'https' AS proto,
       'example.com' AS host,
       '/app/' || event_type AS path,
       'uid=' || CAST(user_id AS VARCHAR) || '&x=1' AS query,
       'frag' AS fragment,
       user_id AS uid_param,
       upper(md5(event_type)) AS etype_md5,
       upper(sha256(event_type)) AS etype_sha256,
       upper(hex(event_type)) AS etype_hex,
       to_base64(encode(event_type)) AS etype_b64
FROM events WHERE event_id < 500
"""


def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = call("split", F.col("text"), " ")
    return docs.select(
        "doc_id",
        call("cardinality", toks).alias("n_tokens"),
        call("cardinality", call("array_distinct", toks)).alias("n_distinct"),
        call("array_max", toks).alias("max_tok"),
        call("array_min", toks).alias("min_tok"),
        call("array_join", call("slice", call("array_sort", toks), 1, 3), ",").alias("first3_sorted"),
        call("contains", toks, "the").alias("has_the"),
        F.coalesce(call("array_position", toks, "data"), F.lit(0).cast("bigint")).alias("data_pos"),
        call("element_at", toks, 3).alias("third"),
        call("reduce", toks, 0, lambda acc, t: acc + F.length(t)).cast("bigint").alias("total_chars"),
        call("cardinality", call("filter", toks, lambda t: F.length(t) >= 5)).alias("n_long"),
        call("cardinality", call("ngrams", toks, 3)).alias("n_3grams"),
        call("any_match", toks, lambda t: t == "spark").alias("has_spark"),
        call("all_match", toks, lambda t: F.length(t) > 0).alias("all_nonempty"),
    )


FN_ARRAY_HOF_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 50)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       list_aggregate(toks, 'max') AS max_tok,
       list_aggregate(toks, 'min') AS min_tok,
       array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted,
       list_contains(toks, 'the') AS has_the,
       CAST(coalesce(list_position(toks, 'data'), 0) AS BIGINT) AS data_pos,
       toks[3] AS third,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
       CAST(len(list_filter(toks, x -> length(x) >= 5)) AS BIGINT) AS n_long,
       CAST(CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 1 END AS BIGINT) AS n_3grams,
       list_contains(toks, 'spark') AS has_spark,
       len(list_filter(toks, x -> length(x) = 0)) = 0 AS all_nonempty
FROM t
"""


def fn_binary_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VarbinaryFunctions.java + BitwiseFunctions.java surface.

    sha1/crc32/xxhash64 have no DuckDB twin and are unit-tested in
    tests/test_functions.py instead.
    """
    ords = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    k = F.col("o_orderkey")
    return ords.select(
        "o_orderkey",
        call("to_hex", call("md5", call("to_utf8", F.col("o_orderpriority")))).alias("prio_md5"),
        call("to_hex", call("sha256", call("to_utf8", F.col("o_orderstatus")))).alias("status_sha256"),
        call("to_hex", call("to_utf8", F.col("o_orderstatus"))).alias("status_hex"),
        call("to_base64", call("to_utf8", F.col("o_orderpriority"))).alias("prio_b64"),
        call("bitwise_and", k, F.lit(255)).alias("and255"),
        call("bitwise_or", k, F.lit(16)).alias("or16"),
        call("bitwise_xor", k, F.lit(85)).alias("xor85"),
        call("bit_count", k).cast("bigint").alias("popcount"),
    )


FN_BINARY_BITWISE_SQL = """
SELECT o_orderkey,
       upper(md5(o_orderpriority)) AS prio_md5,
       upper(sha256(o_orderstatus)) AS status_sha256,
       hex(o_orderstatus) AS status_hex,
       base64(o_orderpriority::BLOB) AS prio_b64,
       o_orderkey & 255 AS and255,
       o_orderkey | 16 AS or16,
       xor(o_orderkey, 85) AS xor85,
       CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
FROM orders WHERE o_orderkey < 200
"""


def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional surface: if, coalesce, nullif, try_cast, CASE, try().

    Reference: TryFunction.java / TryCastFunction.java + grammar-level
    if/case/coalesce/nullif (SqlBase.g4 primaryExpression).
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        call("if", bal < 0, F.lit("neg"), F.lit("pos")).alias("sign_label"),
        call("coalesce", call("nullif", F.col("c_mktsegment"), F.lit("BUILDING")),
             F.lit("<default>")).alias("seg_or_default"),
        call("try_cast", F.col("c_name").substr(F.lit(10), F.lit(8)), "double").alias(
            "name_tail_num"
        ),
        F.when(bal > 5000, "high").when(bal > 0, "low").otherwise("neg").alias("band"),
        call("try", F.lit(1.0) / F.when(bal > 0, bal).otherwise(F.lit(0.0))).alias(
            "inv_bal"
        ),
    )


FN_CONDITIONAL_SQL = """
SELECT c_custkey,
       if(c_acctbal < 0, 'neg', 'pos') AS sign_label,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '<default>') AS seg_or_default,
       try_cast(substr(c_name, 10, 8) AS DOUBLE) AS name_tail_num,
       CASE WHEN c_acctbal > 5000 THEN 'high' WHEN c_acctbal > 0 THEN 'low'
            ELSE 'neg' END AS band,
       CASE WHEN c_acctbal > 0 THEN 1.0 / c_acctbal END AS inv_bal
FROM customer WHERE c_custkey < 300
"""


QUERIES = {
    "fn_string": fn_string,
    "fn_math": fn_math,
    "fn_datetime": fn_datetime,
    "fn_json_url": fn_json_url,
    "fn_array_hof": fn_array_hof,
    "fn_binary_bitwise": fn_binary_bitwise,
    "fn_conditional": fn_conditional,
}

ORACLE = {
    "fn_string": FN_STRING_SQL,
    "fn_math": FN_MATH_SQL,
    "fn_datetime": FN_DATETIME_SQL,
    "fn_json_url": FN_JSON_URL_SQL,
    "fn_array_hof": FN_ARRAY_HOF_SQL,
    "fn_binary_bitwise": FN_BINARY_BITWISE_SQL,
    "fn_conditional": FN_CONDITIONAL_SQL,
}
