"""Skew-mitigation primitives: salted aggregation and replicated skew join.

AQE's skew handling (session.py turns it on) splits oversized *sort-merge
join* partitions at runtime, and Spark's partial aggregation absorbs
skewed keys for combinable aggregates (sum/count/min/max).  Two shapes
remain where an explicit rewrite is the scale answer on a 1000-executor
cluster, and this module provides both:

- **Salted aggregation** for aggregates with *unbounded state*
  (collect_list / map_agg): partial aggregation still ships every element
  of a hot key to one reducer.  ``salted_collect`` splits each key into
  ``salt`` deterministic sub-keys (pmod over a row hash), collects per
  sub-key, then merges the (already-shrunk) partials — the hot key's
  elements flow through ``salt`` reducers instead of one.

- **Replicated skew join** for shuffled joins whose build side is small
  enough to replicate but too big (or too skewed) to broadcast whole:
  the probe side gets a deterministic salt column, the build side is
  exploded once per salt value, and the join key becomes (key, salt) —
  a hot key's probe rows spread over ``salt`` partitions, each holding
  its own copy of the matching build rows.

The reference reaches the same problems through bucketed/grouped
execution (SURVEY.md §4.3 Lifespans); salting is the Spark-idiomatic
equivalent when re-bucketing isn't available mid-query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from facebook_presto_spark.plans.tpch import _t

DEFAULT_SALT = 16


def _salt_of(*cols: Column, salt: int) -> Column:
    """Deterministic per-row salt: pmod of a row hash — reproducible
    across retries (never rand(), which breaks task re-execution)."""
    return F.pmod(F.hash(*cols), F.lit(salt))


def salted_collect(
    df: DataFrame, key: str, value: str, *, salt: int = DEFAULT_SALT
) -> DataFrame:
    """collect_list(value) per key in two salted phases; the result array
    is sorted so the output is deterministic regardless of salt count."""
    phase1 = (
        df.withColumn("__salt", _salt_of(F.col(value), salt=salt))
        .groupBy(key, "__salt")
        .agg(F.collect_list(value).alias("__part"))
    )
    return (
        phase1.groupBy(key)
        .agg(F.array_sort(F.flatten(F.collect_list("__part"))).alias("values"))
    )


def replicated_skew_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    *,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Join ``probe`` (large, possibly key-skewed) to ``build`` (small
    enough to replicate ``salt``×) on ``key`` without broadcasting and
    without a hot partition: probe rows salt deterministically, build
    rows replicate across every salt value.

    Only probe-side-preserving join types are expressible: the build
    side is replicated ``salt``×, so a right/full outer join would emit
    every unmatched build row once per salt value.  Those types need a
    different scheme (AQE skew-join handles them) — raise loudly."""
    allowed = {"inner", "cross", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi", "anti", "leftanti",
               "left_anti"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"replicated_skew_join: join type {how!r} is not supported — "
            "the replicated build side cannot preserve right/full outer "
            "semantics (each unmatched build row would appear once per "
            "salt value); use AQE skew-join handling instead"
        )
    salted_probe = probe.withColumn(
        "__salt", _salt_of(*[F.col(c) for c in probe.columns], salt=salt)
    )
    replicated_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_probe.join(replicated_build, [key, "__salt"], how).drop("__salt")


def events_salted_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: per-user sorted event-type sequence via salted
    collect — the unbounded-state aggregation shape where a hot user
    (bot traffic) would otherwise pile one reducer high."""
    events = _t(spark, sf_dir, "events")
    return (
        salted_collect(events, "user_id", "event_type", salt=8)
        .select(
            "user_id",
            F.size("values").alias("n_events"),
            F.concat_ws(",", "values").alias("event_seq"),
        )
    )


EVENTS_SALTED_SESSIONS_SQL = """
SELECT user_id,
       CAST(len(list_sort(list(event_type))) AS INT) AS n_events,
       array_to_string(list_sort(list(event_type)), ',') AS event_seq
FROM events
GROUP BY user_id
"""


QUERIES = {
    "events_salted_sessions": events_salted_sessions,
}

ORACLE = {
    "events_salted_sessions": EVENTS_SALTED_SESSIONS_SQL,
}
