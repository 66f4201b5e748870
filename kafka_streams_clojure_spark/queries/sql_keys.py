"""SQL-API query keys: classic multi-join analytics (TPC-H Q3/Q5/Q6
shapes) executed as ONE SQL text through BOTH engines — the string
passed to ``spark.sql`` over the registered views is byte-identical to
the DuckDB oracle. Demonstrates the declarative surface plus dialect
discipline (decimal-cast sums, timestamp literals, unique tiebreakers).

Catalyst handles the physical side: dimension sides broadcast, join
order reordered by CBO/AQE, fact-table filters pushed to parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.sql import sql

_Q3 = """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE)       AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""

_Q5 = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE)       AS revenue
FROM customer
JOIN orders   ON c_custkey   = o_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""

_Q6 = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
            AS DOUBLE)       AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""

_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""

_Q18 = """
SELECT c_name, o_orderkey, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 150
)
GROUP BY c_name, o_orderkey, o_totalprice
"""


@query("q_sql_tpch_q4", oracle=_Q4)
def q_sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS subquery — Catalyst rewrites
    it to a left-semi join."""
    return sql(spark, sf_dir, _Q4)


@query("q_sql_tpch_q12", oracle=_Q12)
def q_sql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE-gated) aggregation."""
    return sql(spark, sf_dir, _Q12)


@query("q_sql_tpch_q18", oracle=_Q18)
def q_sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over an aggregated+HAVING subquery (large-
    order customers).

    The oracle keeps the classic IN-subquery text; the Spark plan is
    the single-scan rewrite: because ``l_orderkey`` is the grouping key
    of BOTH the subquery and the outer aggregate (one order -> one
    customer), the outer ``sum(l_quantity)`` IS the subquery's sum — so
    aggregate lineitem once, apply the HAVING filter, and join the
    (tiny, post-filter) per-order totals to orders/customer. Halves the
    fact-table I/O vs the naive plan's two lineitem scans — at 100 TB
    that is the dominant cost. The HAVING compare runs on the exact
    DECIMAL sum (cast to double only on output) for oracle bit-parity.
    """
    from pyspark.sql import functions as F

    from kafka_streams_clojure_spark.queries._util import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("__q"))
        .filter(F.col("__q") > 150)
    )
    return (
        qty.join(orders, qty["l_orderkey"] == orders["o_orderkey"])
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("__q").cast("double").alias("total_qty"),
        )
    )


@query("q_sql_tpch_q3", oracle=_Q3)
def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): 3-way join, filtered fact,
    grouped revenue, deterministic top-10."""
    return sql(spark, sf_dir, _Q3)


@query("q_sql_tpch_q5", oracle=_Q5)
def q_sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): 6-way snowflake join with
    a cross-dimension equality (c_nationkey = s_nationkey)."""
    return sql(spark, sf_dir, _Q5)


@query("q_sql_tpch_q6", oracle=_Q6)
def q_sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure scan+filter+agg —
    the predicate-pushdown showcase."""
    return sql(spark, sf_dir, _Q6)


_Q7 = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)
"""


@query("q_sql_tpch_q7", oracle=_Q7)
def q_sql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): the SAME dimension joined
    twice under different roles (supplier nation vs customer nation)
    with a symmetric pair predicate, grouped by shipment year."""
    return sql(spark, sf_dir, _Q7)


_Q8 = """
SELECT o_year,
       CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_5'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice, l_discount, s_nationkey
  FROM lineitem
  JOIN part     ON p_partkey  = l_partkey
  JOIN supplier ON s_suppkey  = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey  = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
    AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) flat
JOIN nation n2 ON flat.s_nationkey = n2.n_nationkey
GROUP BY o_year
"""


@query("q_sql_tpch_q8", oracle=_Q8)
def q_sql_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): 7-way join feeding a
    conditional-sum / total-sum ratio per year (both sums decimal-cast;
    the final division is a single IEEE double op, engine-identical)."""
    return sql(spark, sf_dir, _Q8)


_Q9 = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) - l_quantity * l_tax
                     AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey  = l_partkey
JOIN supplier ON s_suppkey  = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
"""


@query("q_sql_tpch_q9", oracle=_Q9)
def q_sql_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): LIKE-filtered part join,
    per-row profit expression, nation×year rollup. (No partsupp table
    in the fixtures — profit omits supplycost, keeping the shape.)"""
    return sql(spark, sf_dir, _Q9)


_Q10 = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q_sql_tpch_q10", oracle=_Q10)
def q_sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): revenue of returns per
    customer, deterministic top-20 (c_custkey tiebreaker)."""
    return sql(spark, sf_dir, _Q10)


_Q11 = """
SELECT s_nationkey,
       CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS nation_bal
FROM supplier
GROUP BY s_nationkey
HAVING CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) >
       (SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) * 0.04
        FROM supplier)
"""


@query("q_sql_tpch_q11", oracle=_Q11)
def q_sql_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): GROUP BY ... HAVING against
    an uncorrelated scalar-subquery fraction of the global total. (No
    partsupp table — supplier account balances keep the shape.)"""
    return sql(spark, sf_dir, _Q11)


_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@query("q_sql_tpch_q13", oracle=_Q13)
def q_sql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): LEFT JOIN with an extra join
    predicate, two stacked aggregations — count(nullable) counts only
    matched orders, zero-order customers stay via the outer join."""
    return sql(spark, sf_dir, _Q13)


_Q14 = """
SELECT 100.00 *
       CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@query("q_sql_tpch_q14", oracle=_Q14)
def q_sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional-revenue percentage —
    one fact⋈dim join, two decimal-cast sums, one double division."""
    return sql(spark, sf_dir, _Q14)


_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@query("q_sql_tpch_q15", oracle=_Q15)
def q_sql_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): CTE consumed twice — once joined, once
    reduced to a scalar max subquery. Decimal-cast revenue makes the
    equality comparison exact in both engines."""
    return sql(spark, sf_dir, _Q15)


_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#9'
  AND p_type <> 'PROMO'
  AND p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 100.0
  )
GROUP BY p_brand, p_type, p_size
"""


@query("q_sql_tpch_q16", oracle=_Q16)
def q_sql_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier-part relationship count): negated
    predicates + IN list + NOT IN subquery + COUNT DISTINCT. (lineitem
    is the part↔supplier bridge — the fixtures carry no partsupp.)"""
    return sql(spark, sf_dir, _Q16)


_Q17 = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND p_type = 'SMALL'
  AND l_quantity < (
    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  / count(l2.l_quantity))
    FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


@query("q_sql_tpch_q17", oracle=_Q17)
def q_sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar AVG
    subquery per part — Catalyst rewrites it to an aggregate + join;
    the 0.2×avg threshold is decimal-exact then one double multiply."""
    return sql(spark, sf_dir, _Q17)


_Q19 = """
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@query("q_sql_tpch_q19", oracle=_Q19)
def q_sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunction of conjunctive
    band predicates across BOTH join sides — the OR-pushdown stressor."""
    return sql(spark, sf_dir, _Q19)


_Q20 = """
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_11'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 50
  )
"""


@query("q_sql_tpch_q20", oracle=_Q20)
def q_sql_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): semi-join against an
    aggregated + HAVING subquery over a LIKE-filtered join. (lineitem
    shipment volume stands in for partsupp availability.)"""
    return sql(spark, sf_dir, _Q20)


_Q21 = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
"""


@query("q_sql_tpch_q21", oracle=_Q21)
def q_sql_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept waiting): correlated EXISTS
    + NOT EXISTS on the same fact under different aliases — the only
    supplier at fault in a multi-supplier order. (l_returnflag stands
    in for the missing receipt/commit dates.)"""
    return sql(spark, sf_dir, _Q21)


_Q22 = """
SELECT cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM (
  SELECT substr(c_name, 18, 1) AS cntrycode, c_acctbal
  FROM customer
  WHERE substr(c_name, 18, 1) IN ('1', '2', '3', '4', '5')
    AND c_acctbal > (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             / count(c_acctbal)
      FROM customer
      WHERE c_acctbal > 0.0 AND substr(c_name, 18, 1) IN ('1','2','3','4','5')
    )
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
) custsale
GROUP BY cntrycode
"""


@query("q_sql_tpch_q22", oracle=_Q22)
def q_sql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): uncorrelated scalar AVG
    filter + anti-join (NOT EXISTS urgent orders — plain no-orders is empty at
    fixture density) + substring country-code rollup. (c_name digits
    stand in for the missing phone column.)"""
    return sql(spark, sf_dir, _Q22)


_Q2 = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part
JOIN lineitem  ON l_partkey = p_partkey
JOIN supplier  ON s_suppkey = l_suppkey
JOIN nation    ON s_nationkey = n_nationkey
JOIN region    ON n_regionkey = r_regionkey
WHERE p_size = 11
  AND r_name = 'EUROPE'
  AND s_acctbal = (
    SELECT min(s2.s_acctbal)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation   n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region   r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
GROUP BY s_acctbal, s_name, n_name, p_partkey, p_name
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("q_sql_tpch_q2", oracle=_Q2)
def q_sql_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): correlated scalar MIN
    subquery repeating the outer join chain under fresh aliases.
    (lineitem bridges part↔supplier; s_acctbal stands in for the
    missing ps_supplycost, min-acctbal supplier per part in-region.)"""
    return sql(spark, sf_dir, _Q2)


_RECURSIVE_SPINE = """
WITH RECURSIVE days(d) AS (
  SELECT TIMESTAMP '1996-01-01 00:00:00'
  UNION ALL
  SELECT d + INTERVAL 1 DAY FROM days WHERE d < TIMESTAMP '1996-02-28 00:00:00'
),
daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY 1
)
SELECT d AS day,
       coalesce(n, 0) AS n_orders,
       CAST(coalesce(rev, 0) AS DOUBLE) AS revenue
FROM days LEFT JOIN daily USING (d)
"""


@query("q_sql_recursive_cte", oracle=_RECURSIVE_SPINE)
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE`` / UnionLoop): generate
    a contiguous date spine by recursion, then LEFT JOIN daily order
    totals onto it — the classic "report every day, including zero-order
    days" shape that a bare GROUP BY cannot produce. One byte-identical
    SQL text runs through both engines.

    Scale shape: the fact table is two-phase aggregated to per-day rows
    BEFORE meeting the spine — joining the spine directly to raw orders
    would force Spark to broadcast the FACT side (LeftOuter keeps the
    spine as stream side, so the build side is orders: impossible at
    100 TB; verified in the plan). Aggregated-first, the outer join is
    tiny-spine × small-daily and broadcastable either way; the
    recursion itself materializes only the 59-row spine (UnionLoop).
    """
    return sql(spark, sf_dir, _RECURSIVE_SPINE)


_LATERAL_TOP2 = """
SELECT n_name, t.c_name, t.c_acctbal
FROM nation, LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) t
"""


@query("q_sql_lateral", oracle=_LATERAL_TOP2)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 lateral join): per nation,
    the top-2 customers by account balance — the for-each-row-of-the-
    outer-table idiom (identical text in DuckDB; ``c_custkey`` is the
    unique ORDER BY tiebreaker both engines share).

    Catalyst decorrelates the lateral limit into a per-key rank window
    + broadcast join rather than 25 separate probes — no nested-loop in
    the plan. The decorrelation does leave one redundant global
    range-sort of customer before the window (the subquery's ORDER BY,
    preserved verbatim); the hand-optimized twin of this shape is
    q_topk_per_group, which plans a single WindowGroupLimit pass —
    that's the operator to reach for when the per-group limit is the
    POINT rather than a lateral correlation example.
    """
    return sql(spark, sf_dir, _LATERAL_TOP2)


_GROUP_BY_ALL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY ALL
"""


@query("q_sql_group_by_all", oracle=_GROUP_BY_ALL)
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (the DuckDB-popularized shorthand Spark adopted in
    3.4): every non-aggregate select item becomes a grouping key — one
    byte-identical text through both engines, rounding out the shared
    modern-SQL dialect surface next to WITH RECURSIVE and LATERAL."""
    return sql(spark, sf_dir, _GROUP_BY_ALL)
