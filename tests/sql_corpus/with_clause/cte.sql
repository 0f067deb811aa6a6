-- groups: with_clause; tables: orders, customer
WITH big AS (
  SELECT o_custkey, count(*) AS n
  FROM orders GROUP BY o_custkey HAVING count(*) >= 12
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS big_customers
FROM customer JOIN big ON c_custkey = o_custkey
GROUP BY c_nationkey
ORDER BY big_customers DESC, c_nationkey
LIMIT 5
