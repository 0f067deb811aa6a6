-- groups: aggregate; tables: lineitem
SELECT l_returnflag,
       CAST(min(l_orderkey) AS BIGINT) AS min_ok,
       CAST(max(l_orderkey) AS BIGINT) AS max_ok,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
