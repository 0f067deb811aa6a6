-- groups: subquery; tables: orders, customer
SELECT o_orderkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
ORDER BY o_orderkey LIMIT 30
