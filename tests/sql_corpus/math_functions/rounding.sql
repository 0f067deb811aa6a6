-- groups: math_functions; tables: orders
SELECT o_orderkey, CAST(round(o_totalprice) AS BIGINT) AS r0,
       CAST(ceiling(o_totalprice) AS BIGINT) AS ce,
       CAST(floor(o_totalprice) AS BIGINT) AS fl,
       CAST(truncate(o_totalprice) AS BIGINT) AS tr
FROM orders ORDER BY o_orderkey LIMIT 50
--!oracle
SELECT o_orderkey, CAST(round(o_totalprice) AS BIGINT) AS r0,
       CAST(ceiling(o_totalprice) AS BIGINT) AS ce,
       CAST(floor(o_totalprice) AS BIGINT) AS fl,
       CAST(trunc(o_totalprice) AS BIGINT) AS tr
FROM orders ORDER BY o_orderkey LIMIT 50
