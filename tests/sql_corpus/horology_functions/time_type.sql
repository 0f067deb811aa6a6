-- groups: horology_functions; tables: nation
-- Presto TIME type (StandardTypes.java:35) → Spark 4.1 TimeType
-- (spark.sql.timeType.enabled); DuckDB TIME renders identically.
SELECT n_nationkey, TIME '12:34:56' AS t,
       hour(TIME '12:34:56') AS h, minute(TIME '12:34:56') AS m,
       CAST('09:15:00' AS TIME) AS c,
       TIME '10:00:00' < TIME '11:00:00' AS cmp
FROM nation ORDER BY n_nationkey LIMIT 5
