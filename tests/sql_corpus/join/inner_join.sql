-- groups: join; tables: nation, region
SELECT n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY n_name
