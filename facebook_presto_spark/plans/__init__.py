"""Full query plans: TPC-H (adapted to the driver's star schema) and
operator-coverage queries mirroring the reference's test corpus
(presto-tests/.../AbstractTestQueries.java, presto-product-tests sql-tests)."""

from facebook_presto_spark.plans import tpch, relational

__all__ = ["tpch", "relational"]
