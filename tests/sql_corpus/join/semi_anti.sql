-- groups: join; tables: customer, orders
SELECT count(*) AS with_orders
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
