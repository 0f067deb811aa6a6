-- groups: window_functions; tables: orders
SELECT o_orderkey,
       lag(o_orderkey, 1, -1) OVER (ORDER BY o_orderkey) AS prev_k,
       lead(o_orderkey, 2) OVER (ORDER BY o_orderkey) AS next2,
       ntile(4) OVER (ORDER BY o_orderkey) AS quartile,
       dense_rank() OVER (ORDER BY o_orderpriority) AS pr_rank
FROM orders ORDER BY o_orderkey LIMIT 40
