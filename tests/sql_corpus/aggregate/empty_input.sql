-- groups: aggregate; tables: orders
-- global aggregation over empty input: count = 0, sum/max = NULL
SELECT count(*) AS c, CAST(sum(o_orderkey) AS BIGINT) AS s,
       max(o_orderstatus) AS m
FROM orders WHERE o_orderkey < 0
