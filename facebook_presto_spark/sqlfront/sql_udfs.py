"""Declarative Spark SQL UDFs for the sketch long-tail.

The reference registers every function in one FunctionRegistry, so a
SQL user reaches SetDigest/qdigest scalars exactly like any other
function (type/setdigest/SetDigestFunctions.java:45-115,
operator/scalar/QuantileDigestFunctions.java:41-91).  Here the SQL
path reaches the same surface through Spark 4 declarative SQL UDFs
(`CREATE TEMPORARY FUNCTION ... RETURN <expr>`), whose bodies are the
EXACT expression trees of the Column-API twins in
functions/sketch_fns.py — one implementation's semantics, two
spellings, both pure JVM (no Python in any of these).

Representations (documented in COVERAGE.md):
- SetDigest = sorted bottom-k array<bigint> of xxhash64 values
  (exact below k = 8192, order-statistic estimator at/above k);
- qdigest = map<bucket, count> keyed on the top-8-significant-bit
  truncation of the value.

The aggregate halves (make_set_digest / merge_set_digest /
qdigest_agg / merge_qdigest) cannot be SQL UDFs (Spark has no SQL
UDAFs) and are translation rules instead — sqlfront/functions.py
rewrites them into the same collect-based expression trees.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_K = 8192  # SetDigest.java:54 DEFAULT_MAX_HASHES
_MIN_LONG = "-9.223372036854776E18"
_TWO_64 = "1.8446744073709552E19"

# bottom-k order-statistic estimator (sketch_fns._bottom_k_cardinality):
# exact below k; k-th smallest of n uniform hashes sits at normalized
# position k/(n+1) of the hash space -> n ~ (k-1)/p
_CARD = f"""
CASE WHEN size({{d}}) < {_K} THEN CAST(size({{d}}) AS BIGINT)
     ELSE CAST(round((CAST(size({{d}}) AS DOUBLE) - 1.0)
          / ((CAST(element_at({{d}}, size({{d}})) AS DOUBLE) - {_MIN_LONG})
             / {_TWO_64})) AS BIGINT)
END"""


def _card(d: str) -> str:
    return _CARD.format(d=d)


_UNION = f"slice(array_sort(array_union(a, b)), 1, {_K})"

DDL: list[str] = [
    # ---- SetDigest scalars (SetDigestFunctions.java:45-115) ----
    f"""CREATE OR REPLACE TEMPORARY FUNCTION cardinality_setdigest(d ARRAY<BIGINT>)
RETURNS BIGINT RETURN {_card('d')}""",

    f"""CREATE OR REPLACE TEMPORARY FUNCTION jaccard_index(a ARRAY<BIGINT>, b ARRAY<BIGINT>)
RETURNS DOUBLE RETURN
  CAST(size(array_intersect(array_intersect({_UNION}, a), b)) AS DOUBLE)
  / size({_UNION})""",

    f"""CREATE OR REPLACE TEMPORARY FUNCTION intersection_cardinality(a ARRAY<BIGINT>, b ARRAY<BIGINT>)
RETURNS BIGINT RETURN
  CASE WHEN size(a) < {_K} AND size(b) < {_K}
       THEN CAST(size(array_intersect(a, b)) AS BIGINT)
       ELSE least(
         CAST(round((CAST(size(array_intersect(array_intersect({_UNION}, a), b)) AS DOUBLE)
                     / size({_UNION}))
                    * CAST({_card(_UNION)} AS DOUBLE)) AS BIGINT),
         {_card('a')}, {_card('b')})
  END""",

    """CREATE OR REPLACE TEMPORARY FUNCTION hash_counts(d ARRAY<BIGINT>)
RETURNS MAP<BIGINT, SMALLINT> RETURN
  map_from_arrays(d, transform(d, x -> CAST(1 AS SMALLINT)))""",

    # ---- qdigest scalars (QuantileDigestFunctions.java:41-91) ----
    # value -> bucket floor keeping the top 8 significant bits
    # (sketch_fns.qdigest_bucket: exact integer arithmetic only)
    """CREATE OR REPLACE TEMPORARY FUNCTION qdigest_bucket(v BIGINT)
RETURNS BIGINT RETURN
  CASE WHEN v < 0 THEN -(abs(v) - (abs(v) % CAST(pow(2.0,
            greatest(CASE WHEN abs(v) = 0 THEN 0 ELSE length(bin(abs(v))) END - 8, 0)) AS BIGINT)))
       ELSE abs(v) - (abs(v) % CAST(pow(2.0,
            greatest(CASE WHEN abs(v) = 0 THEN 0 ELSE length(bin(abs(v))) END - 8, 0)) AS BIGINT))
  END""",

    # smallest bucket whose cumulative count reaches rank
    # max(1, ceil(q*N)) — sketch_fns.value_at_quantile's fold verbatim
    """CREATE OR REPLACE TEMPORARY FUNCTION value_at_quantile(qd MAP<BIGINT, BIGINT>, q DOUBLE)
RETURNS BIGINT RETURN
  aggregate(
    array_sort(map_entries(qd)),
    named_struct('cum', CAST(0 AS BIGINT), 'found', CAST(NULL AS BIGINT)),
    (acc, e) -> named_struct(
      'cum', acc.cum + e.value,
      'found', CASE WHEN acc.found IS NULL AND acc.cum + e.value >=
                  greatest(CAST(1 AS BIGINT),
                           CAST(ceil(q * aggregate(array_sort(map_entries(qd)),
                                CAST(0 AS BIGINT), (a2, e2) -> a2 + e2.value)) AS BIGINT))
               THEN e.key ELSE acc.found END),
    acc -> acc.found)""",

    # value_at_quantile's fold fully inlined per element: SQL-UDF
    # inlining cannot substitute a lambda variable into another SQL
    # UDF's parameter, so the call form `transform(qs, q ->
    # value_at_quantile(qd, q))` fails analysis — the nested-lambda
    # spelling is equivalent and resolves
    """CREATE OR REPLACE TEMPORARY FUNCTION values_at_quantiles(qd MAP<BIGINT, BIGINT>, qs ARRAY<DOUBLE>)
RETURNS ARRAY<BIGINT> RETURN
  transform(qs, qq ->
    aggregate(
      array_sort(map_entries(qd)),
      named_struct('cum', CAST(0 AS BIGINT), 'found', CAST(NULL AS BIGINT)),
      (acc, e) -> named_struct(
        'cum', acc.cum + e.value,
        'found', CASE WHEN acc.found IS NULL AND acc.cum + e.value >=
                    greatest(CAST(1 AS BIGINT),
                             CAST(ceil(qq * aggregate(array_sort(map_entries(qd)),
                                  CAST(0 AS BIGINT), (a2, e2) -> a2 + e2.value)) AS BIGINT))
                 THEN e.key ELSE acc.found END),
      acc -> acc.found))""",
]


def install(spark: SparkSession) -> None:
    """Register the declarative SQL UDFs (idempotent — OR REPLACE)."""
    for ddl in DDL:
        spark.sql(ddl)
