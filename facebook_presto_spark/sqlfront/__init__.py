"""Presto-dialect SQL front-end.

``translate(sql)`` rewrites a Presto SQL string (the reference's dialect,
grammar ``presto-parser/src/main/antlr4/com/facebook/presto/sql/parser/
SqlBase.g4``) into Spark-SQL text that Catalyst can plan. This replaces the
reference's parse/analyze stages (``presto-parser/.../SqlParser.java:45``,
``presto-main/.../sql/analyzer/StatementAnalyzer.java:216``): we only bridge
the *dialect gap* and hand the rest to Spark's own analyzer.
"""

from facebook_presto_spark.sqlfront.translate import translate

__all__ = ["translate"]
