-- groups: order_by; tables: orders
SELECT o_orderkey,
       CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS st
FROM orders
ORDER BY st DESC NULLS FIRST, o_orderkey LIMIT 40
