-- groups: json_functions; tables: events
-- events.props is a JSON document column (Presto JSON functions over
-- varchar, JsonFunctions.java).
SELECT event_id, json_extract_scalar(props, '$.k') AS k,
       CAST(json_extract_scalar(props, '$.k') AS BIGINT) AS kn,
       json_extract_scalar(props, '$.missing') AS miss
FROM events ORDER BY event_id LIMIT 60
--!oracle
SELECT event_id, json_extract_string(props, '$.k') AS k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS kn,
       json_extract_string(props, '$.missing') AS miss
FROM events ORDER BY event_id LIMIT 60
