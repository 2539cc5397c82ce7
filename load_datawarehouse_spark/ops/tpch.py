"""TPC-H-shaped relational coverage beyond the round-1/2 set.

Queries q2/q4/q8/q9/q11/q12/q13/q15/q16/q19/q20/q21/q22 adapted to the
driver's TPC-H-ish testdata (no partsupp / comment / phone / shipmode
columns — supply costs derive from lineitem unit prices, country codes
from market segments). Q17/Q18 shapes already exist as
``subq_scalar_avg_qty`` / ``subq_in_groupby_having`` in relational.py.

The reference declares the relational verbs without implementing them
(``bigquery/__init__.py:463-499``); this module widens the Spark-native
realization to the full classic decision-support shapes: correlated
mins, disjunctive pushdown, double-correlated EXISTS/NOT EXISTS,
left-join distributions, and scalar-subquery gates.

Scale principles (same as relational.py): constant-bounded dims
(nation/region and 1-row gates) are force-broadcast via
``bcast_bounded``; sf-proportional dims (part/supplier/customer and
their subsets) join BARE and rely on AQE's runtime size check, which
broadcasts them at bench scale and falls back to a sound shuffle join
at SF100k (round-10 broadcast audit). Fact-fact joins shuffle once on
their keys, every double aggregate accumulates in DECIMAL(38,6) so
results are partitioning-proof, correlated subqueries are decorrelated
into aggregate+join form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from load_datawarehouse_spark.ops._util import (
    bcast_bounded,
    DEC,
    dec_sum,
    lineage_cut,
    sql_dec_sum,
)
from load_datawarehouse_spark.session import load_tables

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier (correlated MIN -> decorrelated agg+join)
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH supply AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
    SELECT l_partkey, MIN(unit_cost) AS best_cost
    FROM supply GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, s.s_acctbal
FROM supply sup
JOIN best b ON b.l_partkey = sup.l_partkey AND sup.unit_cost = b.best_cost
JOIN part p ON p.p_partkey = sup.l_partkey
JOIN supplier s ON s.s_suppkey = sup.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE' AND p.p_size <= 15
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 50
"""


@_register("q2_min_cost_supplier", _Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part (TPC-H Q2 shape, supply cost derived
    from lineitem unit prices).

    Scale: the correlated ``unit_cost = (SELECT MIN ...)`` is
    decorrelated into one groupBy per (part, supp) then a per-part min,
    re-joined on (partkey, unit_cost) — both aggs combine map-side and
    reuse the same partitioning. nation/region are forced-broadcast
    dims; part/supplier join bare (AQE broadcasts them when small);
    lineitem never shuffles twice. Float equality on
    the min is safe: both sides compute MIN over identical IEEE
    divisions. TakeOrderedAndProject caps the driver result at 50.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    supply = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = supply.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost"))
    nations = (
        t["nation"]
        .join(
            t["region"].filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        supply.join(
            best,
            (supply["l_partkey"] == best["l_partkey"])
            & (supply["unit_cost"] == best["best_cost"]),
        )
        .drop(best["l_partkey"])
        .join(
            t["part"].filter(F.col("p_size") <= 15),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(bcast_bounded(nations, "nation x region: <= 25 rows"), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Q4: order-priority checking (EXISTS semi join)
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@_register("q4_order_priority", _Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority counts for orders with a late line (Q4 shape;
    testdata has no commitdate, so "late" = shipped >60 days after the
    order date).

    Scale: the correlated EXISTS becomes a LEFT SEMI join on orderkey
    with the date comparison as a join-side predicate — one shuffle of
    the quarter's orders against lineitem, then a 5-group aggregate.
    The orderdate window pushes to the orders scan.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = t["lineitem"].select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q8: market share of one nation inside a region, per year
# ---------------------------------------------------------------------------

_Q8_ORACLE = f"""
WITH all_volumes AS (
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
                     THEN CAST(volume AS DECIMAL(38,6))
                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
FROM all_volumes
GROUP BY o_year
ORDER BY o_year
"""


@_register("q8_market_share", _Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share inside a region per year (Q8 shape).

    Scale: two fact-fact shuffles (lineitem-orders on orderkey,
    +customer on custkey); nation broadcast, supplier AQE-sized. The
    conditional and total revenue sums accumulate in exact decimal so
    the share is partitioning-proof. Year extraction stays in codegen.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    asia_nations = (
        t["nation"]
        .join(
            t["region"].filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cust_nationkey"))
    )
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(
            bcast_bounded(asia_nations, "nation subset: <= 25 rows"),
            F.col("c_nationkey") == F.col("cust_nationkey"),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            bcast_bounded(supp_nation, "nation: 25 rows"),
            F.col("s_nationkey") == F.col("supp_nationkey"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    target = F.when(
        F.col("supp_nation") == "NATION_7", F.col("volume").cast(DEC)
    ).otherwise(F.lit(0).cast(DEC))
    return (
        df.groupBy("o_year")
        .agg(
            (
                F.sum(target).cast("double")
                / F.sum(F.col("volume").cast(DEC)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit per nation per year
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       {sql_dec_sum(
           "l.l_extendedprice * (1 - l.l_discount)"
           " - 0.1 * p.p_retailprice * l.l_quantity",
           "sum_profit",
       )}
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@_register("q9_product_profit", _Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and year for one part family (Q9
    shape; cost proxy = 10% of retail price x quantity, since the
    testdata has no partsupp supplycost).

    Scale: the part-name filter prunes lineitem through an AQE-sized
    hash join before the only fact-fact shuffle (orders on orderkey).
    Profit accumulates in exact decimal.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_name").like("%gear%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(bcast_bounded(t["nation"], "nation: 25 rows"), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_sum("profit", "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11: important stock (HAVING against a scalar global fraction)
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH partvalue AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6))) AS value
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY l_partkey
)
SELECT l_partkey, CAST(value AS DOUBLE) AS value
FROM partvalue
WHERE CAST(value AS DOUBLE) >
      (SELECT CAST(SUM(value) AS DOUBLE) * 4 / COUNT(*) FROM partvalue)
ORDER BY value DESC, l_partkey
"""


@_register("q11_important_stock", _Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose stock value exceeds a fraction of one nation's
    total (Q11 shape).

    Scale: per-part values aggregate once (map-side combine); the
    scalar gate is a 1-row re-aggregate of that same result, joined
    back by broadcast cross — the fact table is scanned exactly once
    and the per-part aggregate is reused for both branches. Exact
    decimal keeps the fraction comparison partitioning-proof.

    Scale note (re-anchored r17 per VERDICT r16 #1): the original
    fixed FRACTION-of-total gate (value > 0.001 * SUM) dilutes as
    parts grow with sf (TPC-H itself scales Q11's fraction by 1/SF
    for the same reason), emptying the result at sf>=1 and making
    the sf1 certificate a vacuous empty-set agreement. The gate is
    now a multiple of the AVERAGE part value (value > 4 * AVG) — the
    same HAVING-against-a-global-scalar-aggregate shape, but
    scale-invariant by construction: measured 11 / 910 / 9100 rows
    at sf0.01 / sf1 / sf10 (a stable ~0.7-0.9% of parts).
    """
    t = load_tables(spark, sf_dir, register_views=False)
    nat_supps = (
        t["supplier"]
        .join(
            bcast_bounded(t["nation"].filter(F.col("n_name") == "NATION_3"), "nation: 1 row"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    partvalue = (
        t["lineitem"]
        .join(nat_supps, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            # multiply in DOUBLE (IEEE-identical in Spark and DuckDB),
            # then accumulate the decimal-rounded product exactly:
            # decimal x decimal would hit engine-specific result-scale
            # rules (Spark truncates to fit precision 38, DuckDB keeps
            # scale 12) and diverge in the 7th decimal place
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(DEC)
            ).alias("value_dec")
        )
    )
    partvalue = partvalue.transform(lineage_cut)
    # threshold = 4x the mean part value, derived as exact-decimal SUM
    # cast to double, then * 4 / COUNT — the identical IEEE op
    # sequence the oracle runs, so the strict comparison is
    # bit-reproducible across engines (decimal AVG result types
    # differ between Spark and DuckDB; decimal SUM does not)
    threshold = partvalue.agg(
        (
            F.sum("value_dec").cast("double") * F.lit(4.0) / F.count(F.lit(1))
        ).alias("threshold")
    )
    return (
        partvalue.crossJoin(bcast_bounded(threshold, "1-row aggregate"))
        .filter(F.col("value_dec").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q12: priority counts by return flag (CASE aggregation over a join)
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@_register("q12_priority_lines", _Q12_ORACLE)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High/low-priority line counts per return flag (Q12 shape; the
    testdata has no shipmode, so return flag is the grouping axis).

    Scale: shipdate year pushes to the lineitem scan; one shuffle on
    orderkey; the CASE counts fold into one partial aggregate.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (left outer + double group)
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@_register("q13_order_distribution", _Q13_ORACLE)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts, zero-order customers
    included (Q13 shape; the join-side predicate filters a priority
    class instead of a comment pattern).

    Scale: left outer on custkey is the only wide shuffle; COUNT(col)
    ignores the nulls the outer join introduces, so zero-order
    customers land in bucket 0 without a second pass. The second
    groupBy is over |distinct counts| ~ tens of rows.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    o = t["orders"].filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        t["customer"]
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15: top supplier (scalar MAX over a derived revenue view)
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@_register("q15_top_supplier", _Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the quarter's maximum revenue (Q15 shape).

    Scale: revenue aggregates once per supplier (map-side combine);
    the scalar MAX is a 1-row re-aggregate broadcast back — equality
    on exact DECIMAL sums, so ties and float drift can't diverge
    between engines or partitionings.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
            ).alias("total_revenue_dec")
        )
    )
    revenue = revenue.transform(lineage_cut)
    best = revenue.agg(F.max("total_revenue_dec").alias("best_revenue"))
    return (
        revenue.crossJoin(bcast_bounded(best, "1-row aggregate"))
        .filter(F.col("total_revenue_dec") == F.col("best_revenue"))
        .join(
            t["supplier"],
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16: supplier counts per part attribute (NOT IN anti join + distinct)
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_size IN (1, 7, 14, 23, 36, 45, 49, 50)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@_register("q16_supplier_part_counts", _Q16_ORACLE)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier counts per (brand, type, size), excluding
    blacklisted suppliers (Q16 shape; the complaint-comment filter
    becomes a negative-balance filter).

    Scale: the blacklist is a LEFT ANTI equi join (s_suppkey is
    non-null, so NOT IN == anti join here) — supplier-proportional, so
    no forced broadcast; brand/size predicates push through the
    AQE-sized part join to the scan. COUNT DISTINCT
    shuffles (group keys, suppkey) once — Spark's two-phase distinct
    aggregate, no row explosion.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 7, 14, 23, 36, 45, 49, 50)
    )
    blacklist = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            blacklist,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive predicate pushdown (OR-of-ANDs across a join)
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {sql_dec_sum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@_register("q19_disjunctive_revenue", _Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR-of-ANDs predicate spanning both join sides
    (Q19 shape).

    Scale: Catalyst extracts the common single-side conjuncts — the
    brand/size disjunction prunes the part scan, the quantity
    disjunction prunes lineitem — before the AQE-sized join applies
    the cross-side residual. One scan each side, one exact-decimal
    aggregate.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    joined = t["lineitem"].join(
        t["part"], F.col("p_partkey") == F.col("l_partkey")
    )
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(cond).agg(dec_sum(rev, "revenue"))


# ---------------------------------------------------------------------------
# Q20: suppliers with excess shipped volume of one part family
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_12'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'small%'
    GROUP BY l.l_suppkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(38,6))) > 400
  )
ORDER BY s.s_name
"""


@_register("q20_excess_suppliers", _Q20_ORACLE)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers of one nation who shipped a large volume of one part
    family (Q20 shape; availability threshold becomes a shipped-volume
    threshold — no partsupp in the testdata).

    Scale: the IN-subquery aggregates lineitem once (part filter
    AQE-sized) and semi-joins the supplier dim against it;
    supplier never fans out. Exact-decimal HAVING keeps the threshold
    partitioning-proof.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    heavy = (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_name").like("small%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(
            bcast_bounded(t["nation"].filter(F.col("n_name") == "NATION_12"), "nation: 1 row"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who were the sole late shipper in multi-supplier orders
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH late AS (
    SELECT l.l_orderkey, l.l_suppkey, o.o_orderdate
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 25
"""


@_register("q21_sole_late_supplier", _Q21_ORACLE)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who alone shipped late in finished multi-supplier
    orders (Q21 shape: EXISTS + NOT EXISTS, both correlated on
    orderkey with an inequality on suppkey).

    Scale: both correlations decorrelate into per-orderkey aggregates
    — distinct supplier count (for "another supplier exists") and
    distinct LATE supplier count (for "no OTHER late supplier") — then
    one equi join back on orderkey. Every aggregate combines map-side;
    no per-row subquery, no double scan of the late set (it's
    lineage-cut once). The "late" derivation shuffles lineitem-orders
    on orderkey; everything downstream reuses that key.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    late = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    late = late.transform(lineage_cut)
    # per-order supplier fan-outs, computed once each
    order_supps = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supps"))
        .filter(F.col("n_supps") >= 2)
        .select(F.col("l_orderkey").alias("ms_orderkey"))
    )
    late_supps = (
        late.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_late"))
        .filter(F.col("n_late") == 1)
        .select(F.col("l_orderkey").alias("sl_orderkey"))
    )
    return (
        late.join(order_supps, F.col("l_orderkey") == F.col("ms_orderkey"), "left_semi")
        .join(late_supps, F.col("l_orderkey") == F.col("sl_orderkey"), "left_semi")
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q22: rich idle customers per segment (scalar AVG gate + NOT EXISTS)
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(c.c_acctbal AS DECIMAL(38,6))
      * (SELECT COUNT(*) FROM customer c2 WHERE c2.c_acctbal > 0)
      > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(38,6)))
         FROM customer c3 WHERE c3.c_acctbal > 0)
AND NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@_register("q22_idle_rich_segments", _Q22_ORACLE)
def q22_idle_rich_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no URGENT order, grouped
    by market segment (Q22 shape; phone country codes become market
    segments).

    Anchor (VERDICT r15 #1): the original bare NOT EXISTS over orders
    is unsatisfiable on this corpus (every customer has orders at
    every scale), so the driver's sf0.01 row was an empty-set
    agreement. The urgent-priority gate keeps the Q22 shape — scalar
    AVG threshold + NOT EXISTS anti-join — and is populated at every
    scale (75 customers at sf0.01, 9,370 at sf1). The nation-grouped
    sibling ``subq_not_exists_idle_rich`` anchors on order VALUE
    instead, so the two Q22 shapes stay distinct.

    Scale: the scalar AVG gate is a 1-row broadcast; NOT EXISTS is a
    LEFT ANTI join on custkey (the only shuffle). The final aggregate
    is over 5 segments. The "above average" test is expressed as
    ``bal * n > sum`` entirely in exact decimal/integer arithmetic —
    a computed average would be a float whose last ulp can differ
    between engines and summation orders, flipping boundary customers.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    gate = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum(F.col("c_acctbal").cast(DEC)).alias("sum_pos"),
        )
    )
    return (
        t["customer"]
        .crossJoin(bcast_bounded(gate, "1-row aggregate"))
        .filter(F.col("c_acctbal").cast(DEC) * F.col("n_pos") > F.col("sum_pos"))
        .join(
            t["orders"]
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated scalar AVG, brand-gated)
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH part_avg AS (
    SELECT l_partkey,
           (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
            / COUNT(*)) AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12' AND l.l_quantity < 0.2 * a.avg_qty
"""


@_register("q17_small_qty_revenue", _Q17_ORACLE)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if below-20%-of-average-quantity
    orders for one brand were dropped (TPC-H Q17 shape; no p_container
    column in the testdata, so the gate is brand-only).

    Scale: the correlated ``(SELECT 0.2*AVG(l_quantity) WHERE
    l_partkey = p_partkey)`` is decorrelated into a per-partkey
    aggregate JOINed back on partkey. The brand filter is applied
    FIRST via the filtered part dim (1/25th of parts, AQE-sized),
    so both the average and the final sum only ever see that brand's
    lineitems — the per-part average over a part-only predicate is
    unchanged by the restriction, and at SF100k the part dim is far
    too large for the unrestricted aggregate to broadcast. The two
    consumers of the restricted scan share one lineage
    (``localCheckpoint``) so lineitem is read once. The final result
    is one row; the avg comparison is double arithmetic computed
    identically in both engines (exact decimal sum / count).
    """
    t = load_tables(spark, sf_dir, register_views=False)
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    li = (
        t["lineitem"]
        .join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .transform(lineage_cut)
    )
    part_avg = li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(part_avg.withColumnRenamed("l_partkey", "pa_partkey"),
                F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18: large-volume customers (HAVING SUM gate carried through the join)
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
"""


@_register("q18_large_volume_customer", _Q18_ORACLE)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose single orders total more than 250 units (TPC-H
    Q18 shape; threshold tuned so the gate passes ~1% of orders on the
    driver's quantity distribution).

    Scale: the reference Q18 re-joins lineitem after the IN-subquery;
    here the HAVING aggregate already produces ``total_qty``, so the
    big-order set is carried directly into the orders join — one
    groupBy shuffle on l_orderkey, one join shuffle on o_orderkey,
    one on c_custkey, and lineitem is scanned exactly once. The gate
    passes ~1% of orders, so AQE converts the orders and customer
    joins to broadcast at small SF while the plan stays a sound
    shuffle join at SF100k (neither dim is collected). Ordering has a
    full unique tiebreak (totalprice, date, orderkey) so the LIMIT
    boundary is deterministic across partitionings and engines.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )
