-- groups: string_functions; tables: nation
SELECT n_name, length(n_name) AS len, lower(n_name) AS lo,
       upper(lower(n_name)) AS up, reverse(n_name) AS rev,
       substr(n_name, 1, 3) AS pre, trim(concat(' ', n_name, ' ')) AS tr
FROM nation ORDER BY n_name
