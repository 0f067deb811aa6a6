-- groups: order_by; tables: orders
-- Presto's default null ordering is NULLS LAST for ASC and DESC
-- (QueryPlanner.java:936-954); the first column exercises the default,
-- the second an explicit NULLS FIRST.
SELECT o_orderkey,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS p
FROM orders
ORDER BY p, o_orderkey LIMIT 40
