-- groups: distinct; tables: orders
SELECT count(DISTINCT o_orderpriority) AS pr,
       count(DISTINCT o_orderstatus) AS st,
       count(DISTINCT o_custkey) AS ck
FROM orders
