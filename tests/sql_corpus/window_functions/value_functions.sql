-- groups: window_functions; tables: orders
SELECT o_orderkey,
       first_value(o_orderkey) OVER w AS fv,
       last_value(o_orderkey) OVER w AS lv,
       nth_value(o_orderkey, 2) OVER w AS nv
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_orderkey LIMIT 40
