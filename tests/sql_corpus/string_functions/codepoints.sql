-- groups: string_functions; tables: nation
SELECT n_name, codepoint(substr(n_name, 1, 1)) AS cp,
       chr(codepoint(substr(n_name, 1, 1)) + 1) AS nxt
FROM nation ORDER BY n_name
--!oracle
SELECT n_name, unicode(substr(n_name, 1, 1)) AS cp,
       chr(unicode(substr(n_name, 1, 1)) + 1) AS nxt
FROM nation ORDER BY n_name
