-- groups: array_functions; tables: nation
SELECT n_nationkey, cardinality(sequence(1, n_nationkey + 1)) AS card,
       element_at(sequence(0, n_nationkey), 2) AS el,
       contains(sequence(0, 10), n_nationkey) AS has
FROM nation ORDER BY n_nationkey
--!oracle
SELECT n_nationkey, len(generate_series(1, n_nationkey + 1)) AS card,
       list_extract(generate_series(0, n_nationkey), 2) AS el,
       list_contains(generate_series(0, 10), n_nationkey) AS has
FROM nation ORDER BY n_nationkey
