-- groups: binary_functions; tables: region
-- Presto hashes take/return varbinary (VarbinaryFunctions.java);
-- to_hex renders uppercase.
SELECT r_name, to_hex(md5(to_utf8(r_name))) AS m,
       to_hex(sha256(to_utf8(r_name))) AS s,
       to_base64(to_utf8(r_name)) AS b64,
       from_utf8(from_base64(to_base64(to_utf8(r_name)))) AS rt
FROM region ORDER BY r_name
--!oracle
SELECT r_name, upper(md5(r_name)) AS m,
       upper(sha256(r_name)) AS s,
       to_base64(CAST(r_name AS BLOB)) AS b64,
       CAST(from_base64(to_base64(CAST(r_name AS BLOB))) AS VARCHAR) AS rt
FROM region ORDER BY r_name
