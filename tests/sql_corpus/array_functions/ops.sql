-- groups: array_functions; tables: nation
SELECT n_nationkey,
       array_join(array_sort(array_distinct(ARRAY[n_nationkey % 3, 1, 2, n_nationkey % 3])), ',') AS aj,
       array_max(ARRAY[n_nationkey, 5]) AS mx,
       array_min(ARRAY[n_nationkey, 5]) AS mn
FROM nation ORDER BY n_nationkey
--!oracle
SELECT n_nationkey,
       array_to_string(list_sort(list_distinct([n_nationkey % 3, 1, 2, n_nationkey % 3])), ',') AS aj,
       list_max([n_nationkey, 5]) AS mx,
       list_min([n_nationkey, 5]) AS mn
FROM nation ORDER BY n_nationkey
