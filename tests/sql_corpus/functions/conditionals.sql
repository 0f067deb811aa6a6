-- groups: functions; tables: nation
SELECT n_nationkey,
       coalesce(nullif(n_name, 'NATION_0'), 'zeroth') AS co,
       if(n_nationkey % 2 = 0, 'even', 'odd') AS par,
       CASE WHEN n_nationkey < 5 THEN 'low' END AS no_else
FROM nation ORDER BY n_nationkey
