-- groups: subquery; tables: nation, region
SELECT n_name, (SELECT count(*) FROM region) AS nregions
FROM nation ORDER BY n_name LIMIT 10
