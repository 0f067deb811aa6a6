-- groups: subquery; tables: nation, customer
SELECT n_nationkey FROM nation
WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9900)
ORDER BY n_nationkey
