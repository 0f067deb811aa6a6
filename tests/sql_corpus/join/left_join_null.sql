-- groups: join; tables: region, nation
SELECT r_name, count(n_nationkey) AS n
FROM region LEFT JOIN nation ON n_regionkey = r_regionkey AND n_nationkey > 20
GROUP BY r_name
ORDER BY r_name
