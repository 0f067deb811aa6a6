-- groups: array_functions; tables: nation
-- Lambda functions (ArrayTransformFunction / ArrayFilterFunction /
-- ArrayReduceFunction in the reference).
SELECT n_nationkey,
       transform(sequence(1, 4), x -> x * n_nationkey) AS tr,
       filter(sequence(1, 6), x -> x % 2 = 0) AS fl,
       reduce(sequence(1, n_nationkey + 1), 0, (s, x) -> s + x, s -> s) AS rd
FROM nation ORDER BY n_nationkey
--!oracle
SELECT n_nationkey,
       list_transform(generate_series(1, 4), x -> x * n_nationkey) AS tr,
       list_filter(generate_series(1, 6), x -> x % 2 = 0) AS fl,
       CAST(list_sum(generate_series(1, n_nationkey + 1)) AS BIGINT) AS rd
FROM nation ORDER BY n_nationkey
