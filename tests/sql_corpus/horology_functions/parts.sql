-- groups: horology_functions; tables: orders
-- Presto day_of_week is ISO-8601 (Mon=1..Sun=7, DateTimeFunctions.java);
-- DuckDB's matching spelling is isodow.
SELECT o_orderkey, year(o_orderdate) AS y, quarter(o_orderdate) AS q,
       month(o_orderdate) AS m, day(o_orderdate) AS d,
       day_of_week(o_orderdate) AS dow, day_of_year(o_orderdate) AS doy,
       week(o_orderdate) AS wk
FROM orders ORDER BY o_orderkey LIMIT 50
--!oracle
SELECT o_orderkey, year(o_orderdate) AS y, quarter(o_orderdate) AS q,
       month(o_orderdate) AS m, day(o_orderdate) AS d,
       isodow(o_orderdate) AS dow, dayofyear(o_orderdate) AS doy,
       week(o_orderdate) AS wk
FROM orders ORDER BY o_orderkey LIMIT 50
