-- groups: string_functions; tables: region
-- Presto spellings (StringFunctions.java levenshtein_distance /
-- hamming_distance); DuckDB oracle uses levenshtein / hamming.
SELECT r_name, levenshtein_distance(r_name, 'EUROPE') AS lev,
       hamming_distance(substr(r_name, 1, 4), 'EURO') AS ham
FROM region ORDER BY r_name
--!oracle
SELECT r_name, levenshtein(r_name, 'EUROPE') AS lev,
       hamming(substr(r_name, 1, 4), 'EURO') AS ham
FROM region ORDER BY r_name
