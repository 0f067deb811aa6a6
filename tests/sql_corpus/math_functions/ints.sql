-- groups: math_functions; tables: part
SELECT p_partkey, abs(p_size - 25) AS ab,
       CAST(sign(p_size - 25) AS BIGINT) AS sg,
       mod(p_partkey, 7) AS md,
       CAST(power(p_size, 2) AS BIGINT) AS p2,
       greatest(p_size, 10) AS gr, least(p_size, 10) AS ls
FROM part ORDER BY p_partkey LIMIT 30
