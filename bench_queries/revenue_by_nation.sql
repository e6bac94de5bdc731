SELECT n_name, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue, COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY revenue DESC
