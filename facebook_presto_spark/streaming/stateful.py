"""Custom stateful streaming operator: gap-based sessionization with
explicit per-key state (``applyInPandasWithState``).

The reference has no streaming engine at all (SURVEY.md §2.5) — this is
the extension surface for operators whose state outlives any single
window: per-user "currently open session" carried across micro-batches.
``F.session_window`` covers the aggregate case (windows.py); this module
is the escape hatch for *arbitrary* state machines — the Spark-first
equivalent of writing a custom stateful Operator in the reference
(operator/Operator.java) without building an engine.

Scale shape: state is partitioned by the group key and bounded by the
session gap (idle keys time out); each micro-batch shuffles only (key,
event) pairs, and the per-key work is vectorized pandas.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP = pd.Timedelta(hours=1)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("session_id", LongType()),
    ]
)
# (last event ts in micros, last assigned session ordinal)
_STATE_SCHEMA = StructType(
    [StructField("last_ts", LongType()), StructField("sess", LongType())]
)


def _sessionize_group(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_ts, sess = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        out_sess = []
        for ts in pdf["ts"]:
            ts_us = int(ts.value // 1_000)
            if last_ts is None or ts_us - last_ts > SESSION_GAP.value // 1_000:
                sess += 1
            last_ts = ts_us
            out_sess.append(sess)
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": pdf["event_id"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "session_id": out_sess,
            }
        )
    state.update((last_ts, sess))


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded per-user sessionizer: session ordinal per (user, 1h-gap
    run), state carried across micro-batches."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from facebook_presto_spark.streaming.windows import events_stream

    ev = events_stream(spark, sf_dir).select("user_id", "event_id", "ts")
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin (lag + cumulative-sum over a window) — the oracle for the
    streaming operator's availableNow run."""
    from facebook_presto_spark.catalog import events_table

    ev = events_table(spark, sf_dir).select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = int(SESSION_GAP.value // 1_000)
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        # ts is TIMESTAMP_NTZ; unix_micros wants TIMESTAMP — the cast is
        # value-preserving under the engine's fixed UTC session zone.
        | ((F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))) > gap_us),
        1,
    ).otherwise(0)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )
