-- groups: regex_functions; tables: nation
-- Presto regexp_replace replaces every match (JoniRegexpFunctions.java);
-- DuckDB needs the 'g' flag for the same semantics.
SELECT n_name, regexp_extract(n_name, '[A-Z]+$') AS tail,
       regexp_replace(n_name, '[AEIOU]', '_') AS repl,
       regexp_like(n_name, 'IA$') AS m
FROM nation ORDER BY n_name
--!oracle
SELECT n_name, nullif(regexp_extract(n_name, '[A-Z]+$'), '') AS tail,
       regexp_replace(n_name, '[AEIOU]', '_', 'g') AS repl,
       regexp_matches(n_name, 'IA$') AS m
FROM nation ORDER BY n_name
