"""Structured Streaming mirror: the streaming run (availableNow trigger)
must produce exactly the batch result — Structured Streaming's
incremental-execution contract over a deterministic plan."""

from facebook_presto_spark.streaming import windows


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def test_stream_tumbling_equals_batch(spark, sf_dir):
    batch = windows.tumbling_daily(spark, sf_dir).select(
        "window_start", "event_type", "n", "total_value"
    )
    stream_df = windows.stream_tumbling_daily(spark, sf_dir)
    windows.run_stream_to_memory(stream_df, "t_tumble")
    streamed = spark.sql(
        "SELECT window_start, event_type, n, total_value FROM t_tumble"
    )
    assert _rows(batch) == _rows(streamed)


def test_stream_interval_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream interval join over availableNow must
    reproduce the batch interval join (all rows inside the watermark)."""
    stream_df = windows.stream_funnel_1h(spark, sf_dir)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("t_funnel")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT user_id, click_id, purchase_id FROM t_funnel")
    batch = windows.funnel_1h(spark, sf_dir).select("user_id", "click_id", "purchase_id")
    assert _rows(batch) == _rows(streamed)
    assert len(batch.collect()) > 0


def test_stateful_sessionize_matches_batch(spark, sf_dir):
    """applyInPandasWithState sessionizer (explicit per-user state) must
    reproduce the batch lag+cumsum sessionization over availableNow."""
    from facebook_presto_spark.streaming import stateful

    stream_df = stateful.stream_sessionize(spark, sf_dir)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("t_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT user_id, event_id, session_id FROM t_sess")
    batch = stateful.batch_sessionize(spark, sf_dir).select(
        "user_id", "event_id", "session_id"
    )
    assert _rows(batch) == _rows(streamed)
    # sanity: sessions actually split (more than one per heavy user)
    max_sess = streamed.groupBy("user_id").agg({"session_id": "max"}).collect()
    assert max(r[1] for r in max_sess) > 1


def test_stream_watermark_drops_late_rows(spark, sf_dir, tmp_path):
    """With a tiny watermark and append mode, only finalized windows emit —
    the late-data handling surface the reference entirely lacks."""
    from pyspark.sql import functions as F

    ev = windows.events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 day")).count()
    q = (
        agg.writeStream.format("memory")
        .queryName("t_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    finalized = spark.sql("SELECT count(*) AS c FROM t_wm").collect()[0]["c"]
    total_windows = windows.tumbling_daily(spark, sf_dir).select("window_start").distinct().count()
    # append mode emits only windows older than the watermark: strictly fewer
    # than the batch window count (the last open window is withheld).
    assert 0 < finalized < total_windows + 1


def test_stream_dedup_one_row_per_key(spark, sf_dir):
    """dropDuplicatesWithinWatermark keeps exactly one row per
    (user_id, event_type); the surviving key set equals the batch
    dedup twin's (which member survives is arbitrary, like the batch
    dropDuplicates contract)."""
    stream_df = windows.stream_dedup(spark, sf_dir)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT user_id, event_type FROM t_dedup")
    batch_keys = windows.dedup_first_event(spark, sf_dir).select(
        "user_id", "event_type"
    )
    assert _rows(streamed) == _rows(batch_keys)


def test_stream_approx_users_equals_batch(spark, sf_dir):
    """Mergeable HLL sketches under event-time streaming: the streamed
    per-day approx-distinct estimates must equal the batch twin's (one
    bounded sketch per open window, order-insensitive merge)."""
    batch = windows.daily_approx_users(spark, sf_dir)
    stream_df = windows.stream_daily_approx_users(spark, sf_dir)
    windows.run_stream_to_memory(stream_df, "t_approx_users")
    streamed = spark.sql(
        "SELECT window_start, approx_users FROM t_approx_users"
    )
    assert _rows(batch) == _rows(streamed)
