-- groups: window_functions; tables: nation
SELECT n_nationkey,
       CAST(sum(n_regionkey) OVER (ORDER BY n_nationkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running
FROM nation
ORDER BY n_nationkey
