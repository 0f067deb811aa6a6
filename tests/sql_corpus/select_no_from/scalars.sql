-- groups: select_no_from
SELECT 1 + 2 AS a, concat('x', 'y') AS b,
       CAST('2024-03-01' AS DATE) AS c, substr('abcdef', 2, 3) AS d,
       coalesce(NULL, 7) AS e, nullif(3, 3) AS f
