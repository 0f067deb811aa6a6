-- groups: convertion_functions; tables: orders
-- (dir name [sic] mirrors the reference's testcases/convertion_functions)
SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS s,
       CAST(CAST(o_orderdate AS VARCHAR) AS DATE) AS d,
       try_cast(o_orderpriority AS INTEGER) AS bad,
       try_cast(substr(CAST(o_orderkey AS VARCHAR), 1, 2) AS INTEGER) AS good
FROM orders ORDER BY o_orderkey LIMIT 30
--!oracle
SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS s,
       CAST(CAST(o_orderdate AS VARCHAR) AS DATE) AS d,
       try_cast(o_orderpriority AS INTEGER) AS bad,
       try_cast(substr(CAST(o_orderkey AS VARCHAR), 1, 2) AS INTEGER) AS good
FROM orders ORDER BY o_orderkey LIMIT 30
