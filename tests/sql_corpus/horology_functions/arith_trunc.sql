-- groups: horology_functions; tables: orders
-- Presto unit-string date_add/date_diff signatures
-- (DateTimeFunctions.java date_add('unit', n, x)).  Engine divergence,
-- documented: Spark's date_trunc always yields TIMESTAMP, so date_trunc
-- over a DATE column renders with a midnight time part (Presto preserves
-- the DATE type); the oracle casts to match.
SELECT o_orderkey, date_trunc('month', o_orderdate) AS mo,
       date_add('day', 10, o_orderdate) AS plus10,
       date_diff('day', DATE '1995-01-01', o_orderdate) AS dd,
       last_day_of_month(o_orderdate) AS ld
FROM orders ORDER BY o_orderkey LIMIT 50
--!oracle
SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo,
       o_orderdate + INTERVAL 10 DAY AS plus10,
       date_diff('day', DATE '1995-01-01', o_orderdate) AS dd,
       last_day(o_orderdate) AS ld
FROM orders ORDER BY o_orderkey LIMIT 50
