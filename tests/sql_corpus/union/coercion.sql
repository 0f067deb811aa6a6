-- groups: union; tables: nation, region
SELECT k, src FROM (
  SELECT n_nationkey AS k, 'n' AS src FROM nation
  UNION ALL
  SELECT r_regionkey AS k, 'r' AS src FROM region
) t
ORDER BY k, src LIMIT 30
