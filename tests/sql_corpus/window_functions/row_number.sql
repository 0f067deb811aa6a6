-- groups: window_functions; tables: customer
SELECT c_nationkey, c_name, rn
FROM (
  SELECT c_nationkey, c_name,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
WHERE rn <= 2 AND c_nationkey < 10
ORDER BY c_nationkey, rn
