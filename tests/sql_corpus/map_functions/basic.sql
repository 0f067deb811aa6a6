-- groups: map_functions; tables: nation
-- Presto element_at(map, k) yields the value; DuckDB map_extract yields a
-- one-element list, unwrapped with [1] on the oracle side.
SELECT n_nationkey,
       map_keys(map(ARRAY['a','b'], ARRAY[n_nationkey, 1])) AS ks,
       map_values(map(ARRAY['a','b'], ARRAY[n_nationkey, 1])) AS vs,
       element_at(map(ARRAY['a','b'], ARRAY[n_nationkey, 1]), 'a') AS va,
       element_at(map(ARRAY['a','b'], ARRAY[n_nationkey, 1]), 'z') AS vz,
       cardinality(map(ARRAY['a','b'], ARRAY[n_nationkey, 1])) AS card
FROM nation ORDER BY n_nationkey
--!oracle
SELECT n_nationkey,
       map_keys(map(['a','b'], [n_nationkey, 1])) AS ks,
       map_values(map(['a','b'], [n_nationkey, 1])) AS vs,
       map_extract(map(['a','b'], [n_nationkey, 1]), 'a')[1] AS va,
       map_extract(map(['a','b'], [n_nationkey, 1]), 'z')[1] AS vz,
       cardinality(map(['a','b'], [n_nationkey, 1])) AS card
FROM nation ORDER BY n_nationkey
