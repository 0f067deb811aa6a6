"""Structured Streaming mirror (north-star extension — SURVEY §2.5).

The reference has NO streaming engine: its Kafka connector exposes topics
as static tables of offset-range splits (presto-kafka/.../KafkaRecordSet.java:
152-178), so every windowed computation below has a well-defined *batch*
semantics — which is exactly what Structured Streaming's incremental
execution of the same DataFrame program computes.  Each operator therefore
comes in two forms over the same `events` table:

- batch (oracle-checked against DuckDB via the driver gate), and
- streaming (readStream → identical transformations → sink), unit-tested
  with the availableNow trigger so results must equal the batch run.
"""

from facebook_presto_spark.streaming import windows

__all__ = ["windows"]
