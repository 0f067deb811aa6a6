-- groups: url_functions; tables: nation
-- Presto UrlFunctions.java surface; DuckDB has no URL functions, so the
-- oracle re-derives each part from the same constructed URL.  Hostnames
-- avoid '_' (java.net.URI, used by both engines, rejects it in hosts).
SELECT n_name,
       url_extract_protocol(concat('https://', replace(lower(n_name), '_', '-'), '.example.com:8080/p/x?q=', n_name)) AS proto,
       url_extract_host(concat('https://', replace(lower(n_name), '_', '-'), '.example.com:8080/p/x?q=', n_name)) AS host,
       url_extract_port(concat('https://', replace(lower(n_name), '_', '-'), '.example.com:8080/p/x?q=', n_name)) AS port,
       url_extract_path(concat('https://', replace(lower(n_name), '_', '-'), '.example.com:8080/p/x?q=', n_name)) AS pth,
       url_extract_query(concat('https://', replace(lower(n_name), '_', '-'), '.example.com:8080/p/x?q=', n_name)) AS qry
FROM nation ORDER BY n_name
--!oracle
SELECT n_name,
       'https' AS proto,
       replace(lower(n_name), '_', '-') || '.example.com' AS host,
       CAST(8080 AS BIGINT) AS port,
       '/p/x' AS pth,
       'q=' || n_name AS qry
FROM nation ORDER BY n_name
