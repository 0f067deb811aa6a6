-- groups: set_operation; tables: nation
SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 10
UNION
SELECT n_regionkey FROM nation WHERE n_nationkey >= 20
ORDER BY k
