-- groups: aggregate; tables: orders
SELECT o_orderstatus, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
