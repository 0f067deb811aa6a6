-- groups: empty_table; tables: orders
SELECT o_orderkey, o_orderstatus FROM orders
WHERE o_orderkey < 0 ORDER BY o_orderkey
