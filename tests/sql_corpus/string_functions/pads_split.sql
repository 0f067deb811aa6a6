-- groups: string_functions; tables: nation
SELECT n_name, lpad(n_name, 12, '.') AS lp, rpad(n_name, 12, '.') AS rp,
       split_part(n_name, 'A', 1) AS sp, strpos(n_name, 'AN') AS pos,
       replace(n_name, 'AN', '*') AS rep
FROM nation ORDER BY n_name
