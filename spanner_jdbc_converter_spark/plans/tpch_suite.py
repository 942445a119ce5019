"""TPC-H-shaped parity suite — the join/subquery/aggregation surface
(SURVEY.md §2.3-2.5 capability additions) beyond the q1/q3/q10/q17 set
in queries.py.

Every query is adapted to the driver fixtures (no partsupp table, no
l_shipmode/l_commitdate columns — see FIXTURES.md), keeping the *shape*
that matters: correlated scalar subqueries, EXISTS groups, conditional
aggregation ratios, disjunctive join predicates, HAVING against a
global total, anti-join prospect scans.

Float parity follows queries.py: double arithmetic uses the identical
expression tree on both engines, sums route through DECIMAL(18,4)
(order-independent), ratios divide two already-exact doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.catalog import load_table
from spanner_jdbc_converter_spark.plans.queries import _dec, _money
from spanner_jdbc_converter_spark.plans.registry import register

_DISC_PRICE_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


def _disc_price():
    return _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))


@register(
    "q2_min_acctbal_supplier_per_part",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
      FROM pairs
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_type = 'LARGE' AND p_size <= 10
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
    FROM cand c
    WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2
                       WHERE c2.p_partkey = c.p_partkey)
    ORDER BY p_partkey, s_suppkey
    """,
)
def q2_min_acctbal_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each LARGE small-size
    part, the supplier(s) of that part with the minimum account balance.
    The oracle keeps the correlated scalar-MIN subquery; the Spark plan
    is the decorrelated form Catalyst itself would produce — a window
    MIN over the candidate set, then an equality filter.

    Scale: distinct (partkey, suppkey) pairs aggregate map-side before
    one shuffle; part/supplier are dimension-sized (broadcast); the
    window MIN reuses the hash(p_partkey) exchange.  min over doubles is
    exact — no float drift in the equality."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    s = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    cand = (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(F.broadcast(s), pairs.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .drop("min_bal")
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q4_priority_with_returns",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_cnt
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in a 9-month
    window with at least one returned line, counted per priority
    (fixtures carry no l_commitdate — the EXISTS predicate is
    returnflag='R' instead; the correlated-EXISTS → semi-join shape is
    identical).

    Scale: the date filter pushes to the orders scan; the semi join
    shuffles on orderkey but never duplicates orders rows; the 5-group
    aggregation is map-side partial."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .orderBy("o_orderpriority")
    )


@register(
    "q5_regional_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): revenue from lineitems where the
    customer and supplier share a nation, restricted to one region.
    First corpus entry exercising the region table (full star depth:
    region→nation→{customer,supplier}→orders→lineitem).

    Scale: region (5 rows) and nation (25) broadcast; supplier is
    dimension-sized and broadcasts too, so the only repartition-shuffles
    are lineitem⋈orders on orderkey and the customer join on custkey;
    the c_nationkey = s_nationkey equi-condition rides along the
    supplier join instead of forcing an extra exchange."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_money(F.sum(_disc_price()), "revenue"))
        .orderBy(F.desc("revenue"))
    )


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting-revenue change): single-table filter + global
    aggregate.  The entire WHERE clause is pushable — at 100 TB this is
    a parquet scan with row-group min/max skipping on l_shipdate and no
    shuffle at all (partial sums + one-row merge)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _money(F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount"))), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by ship year — the self-joined dimension shape (nation
    aliased twice) with a disjunctive cross-nation predicate.

    Scale: both nation copies broadcast; the disjunction is evaluated
    post-join on 25×25 combinations, so it never blocks pushdown of the
    shipdate range into the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(_money(F.sum(_disc_price()), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             {_DISC_PRICE_SQL} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_1's share of ECONOMY-part
    revenue delivered into AMERICA, by order year — the conditional-
    aggregation-ratio shape.  Both the numerator and denominator are
    exact decimal sums; the final division is one double op on identical
    operands, so the ratio is bit-stable.

    Scale: part/supplier/nation/region all broadcast; lineitem⋈orders
    is the only large shuffle; years are few, so the final agg is tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS supp_nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               - 0.1 * p_retailprice * l_quantity
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY supp_nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit on red parts by supplier
    nation and order year.  Fixtures have no partsupp/ps_supplycost —
    cost is modeled as 10% of retail price per unit; the join/agg shape
    (5-way join, expression agg, LIKE filter) is Q9's.  The profit
    expression is evaluated in double with an identical tree on both
    engines, then decimal-summed.

    Scale: the LIKE filter prunes part before broadcast; supplier and
    nation broadcast; lineitem⋈orders shuffles on orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_money(F.sum(profit), "sum_profit"))
        .orderBy(F.asc("supp_nation"), F.desc("o_year"))
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH pr AS (
      SELECT l_partkey, SUM({_DISC_PRICE_SQL}) AS rev
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(ROUND(rev, 2) AS DOUBLE) AS part_revenue
    FROM pr
    WHERE rev * (SELECT COUNT(*) FROM pr) * 2 > 3 * (SELECT SUM(rev) FROM pr)
    ORDER BY part_revenue DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose revenue exceeds
    1.5x the MEAN per-part revenue — HAVING against a global-total
    scalar subquery.  TPC-H's fixed "0.1% of total" fraction divides
    by part COUNT implicitly, so it vanishes as SF grows (at sf0.1 the
    top part holds <0.01% of total); the mean-relative form is
    scale-invariant and keeps the query non-vacuous at every fixture
    SF (probed: 2/29/252 rows at sf0.001/0.01/0.1).  The fraction test
    is rearranged to exact decimal arithmetic (rev·n·2 > 3·total) so
    no engine divides.

    Scale: one groupBy(partkey) shuffle; the global (total, n) is a
    one-row broadcast joined to every group — no second pass over
    lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(F.sum(_disc_price()).alias("rev"))
    total = pr.agg(
        F.sum("rev").alias("total_rev"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        pr.crossJoin(F.broadcast(total))
        .filter(F.col("rev") * F.col("n_parts") * 2 > F.col("total_rev") * 3)
        .select("l_partkey", F.round("rev", 2).cast("double").alias("part_revenue"))
        .orderBy(F.desc("part_revenue"), F.asc("l_partkey"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE), 4) AS promo_share_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of one month's revenue
    from PROMO parts — conditional aggregation over a fact⋈dim join.
    Numerator/denominator are exact decimal sums; one double division +
    round on each engine.

    Scale: shipdate range pushes to the lineitem scan (a month of data
    read, not the table); part broadcasts; no agg shuffle (global)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)
                ).cast("double")
                / F.sum(_disc_price()).cast("double"),
                4,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH oq AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(ROUND(sum_qty, 2) AS DOUBLE) AS order_qty
    FROM oq
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE sum_qty > 300
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds 300 units, with their customers.  The classic IN-(grouped
    HAVING subquery) decorrelates to agg→join — written directly in
    that form.

    Scale: groupBy(orderkey) shares its shuffle key with the orders
    join (exchange reuse); the >300 filter cuts the agg output to a
    sliver before any join; customer joins on the already-small side."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    oq = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        oq.join(o, oq.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.round("sum_qty", 2).cast("double").alias("order_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


@register(
    "q19_disjunctive_predicate",
    oracle=f"""
    SELECT CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 35)
    """,
)
def q19_disjunctive_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): OR-of-ANDs predicate spanning both
    join sides — the shape that defeats naive pushdown.  Catalyst still
    extracts the common p_partkey equi-condition (hash join, not a
    nested-loop) and evaluates the residual disjunction post-join.

    Scale: part broadcasts; lineitem is scanned once; per-side IN/range
    components of the disjunction are inferred as partial filters."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            _money(F.sum(_disc_price()), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_prospect_segments",
    oracle="""
    WITH stats AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS bal_sum, COUNT(*) AS bal_n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_prospects,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
    FROM customer CROSS JOIN stats
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) * bal_n > bal_sum
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_prospect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales opportunity): customers with an
    above-average balance and no recent orders, grouped by segment
    (fixtures have no c_phone — segment replaces the country-code
    grouping; every customer has old orders, so the anti-join window is
    'since 1999').  The scalar AVG subquery is rearranged to exact
    decimal cross-multiplication (bal·n > Σbal) — no division anywhere.

    Scale: the one-row stats aggregate broadcasts; the anti join
    broadcasts its filtered key side; customer is scanned once."""
    c = load_table(spark, sf_dir, "customer")
    o_recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec(F.col("c_acctbal"))).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_n"),
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(_dec(F.col("c_acctbal")) * F.col("bal_n") > F.col("bal_sum"))
        .join(o_recent, c.c_custkey == o_recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_prospects"),
            _money(F.sum(_dec(F.col("c_acctbal"))), "total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({_DISC_PRICE_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_rev
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum quarterly
    revenue — the scalar-MAX-subquery-over-a-derived-view shape.  The
    revenue aggregate is exact decimal, so the MAX equality cannot
    float-drift.

    Scale: one groupBy(suppkey) shuffle over a date-pruned scan; the
    one-row MAX broadcasts back against the same aggregate (reused
    exchange), and supplier is a broadcast dimension."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_counts_excluding",
    oracle="""
    SELECT p_brand, p_type,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size IN (1, 14, 23, 45)
      AND p_brand <> 'Brand#5'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
)
def q16_supplier_counts_excluding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    counts per brand × type over selected sizes, excluding a NOT IN
    supplier set (complaint suppliers → negative-balance suppliers in
    the fixture schema; partsupp → observed lineitem pairs).

    Scale: the NOT IN set is a broadcast anti join (safe here: s_suppkey
    is non-null by construction — NULL-semantics of NOT IN would
    otherwise need a null-aware anti join, which Spark plans as
    BroadcastNestedLoopJoin); part is broadcast; distinct-count shuffles
    once on (brand, type)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 14, 23, 45) & (F.col("p_brand") != "Brand#5")
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"))
    )


@register(
    "q20_significant_suppliers",
    oracle="""
    WITH ship AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS supp_qty
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ),
    part_tot AS (
      SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS part_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, COUNT(*) AS n_significant_parts
    FROM ship
    JOIN part_tot USING (l_partkey)
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_name LIKE '%blue%'
      AND supp_qty * 6 > part_qty
    GROUP BY s_suppkey, s_name
    ORDER BY s_suppkey
    """,
)
def q20_significant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who shipped
    more than a sixth of a blue part's total volume, with how many such
    parts each dominates.  The original's nested agg-subquery chain
    (availqty > 0.5·Σqty) is the two-level aggregate + fraction
    comparison kept here, rearranged to exact decimal (qty·6 > total);
    the dominance fraction is 1/6 rather than TPC-H's 1/2 because the
    fixture spreads each part across enough suppliers that no one holds
    half (probed: 1/2 and 1/4 both yield 0 suppliers at sf0.01, 1/6
    yields 10/2/6 at sf0.001/0.01/0.1 — non-vacuous at every SF).

    Scale: the dominance fraction's denominator is per-part, so a
    broadcast semi-join against the blue-part keys BEFORE both
    aggregates is semantics-preserving and prunes the fact table to the
    ~1–5% matching subset — neither groupBy ever shuffles a non-blue
    row (plan-locked in test_plans.py).  Both aggregates then group on
    l_partkey-prefixed keys, so the second reuses the first's shuffle
    partitioning; supplier is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    s = load_table(spark, sf_dir, "supplier")
    blue_li = li.join(
        F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "semi"
    )
    ship = blue_li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec(F.col("l_quantity"))).alias("supp_qty")
    )
    part_tot = blue_li.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum(_dec(F.col("l_quantity"))).alias("part_qty")
    )
    # No post-aggregation join with part: the pre-aggregate semi-join
    # already restricts both sides to blue parts, and p_partkey is
    # unique so the reference inner join never changed cardinality.
    return (
        ship.join(part_tot, ship.l_partkey == part_tot.pt_partkey)
        .filter(F.col("supp_qty") * 6 > F.col("part_qty"))
        .join(F.broadcast(s), ship.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_significant_parts"))
        .orderBy("s_suppkey")
    )


@register(
    "q21_sole_returned_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN orders   ON l1.l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): lines whose
    supplier is the ONLY one with a returned line on a multi-supplier
    finalized order — the double-correlated EXISTS + NOT EXISTS pattern
    with a non-equi (suppkey <>) correlation on both subqueries
    (fixtures have no receipt/commit dates; 'late' → returnflag='R').

    Scale: both correlated subqueries decorrelate to semi/anti joins on
    l_orderkey with a suppkey-inequality residual; all three lineitem
    legs shuffle on the same orderkey, so the exchanges line up;
    supplier broadcasts and the orders leg prunes on status first."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


@register(
    "q12_priority_class_counts",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): lines shipped
    in a year classified by order priority per line status (fixtures
    carry no l_shipmode/commitdate — linestatus stands in for shipmode;
    the pivoted conditional-count-over-join shape is Q12's).  With this
    entry every TPC-H query shape q1-q22 has a corpus adaptation
    (q13 = join_order_counts_per_customer).

    Scale: the shipdate range pushes into the lineitem scan; the join
    shuffles on orderkey; two conditional counts ride one aggregation."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )
