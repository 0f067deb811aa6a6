-- groups: subquery; tables: nation, supplier
SELECT n_name,
       (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_supp
FROM nation
ORDER BY n_name
