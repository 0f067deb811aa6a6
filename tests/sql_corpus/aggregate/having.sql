-- groups: aggregate; tables: customer
SELECT c_nationkey, count(*) AS n
FROM customer
GROUP BY c_nationkey
HAVING count(*) > 6
ORDER BY c_nationkey
