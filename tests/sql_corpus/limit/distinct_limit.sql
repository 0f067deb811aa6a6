-- groups: limit; tables: orders
SELECT o_orderstatus FROM (
  SELECT DISTINCT o_orderstatus FROM orders
)
ORDER BY o_orderstatus
LIMIT 2
