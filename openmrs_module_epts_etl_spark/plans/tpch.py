"""TPC-H-shaped relational queries over the testdata star schema — the
scan/filter/join/aggregate/sort/set-op operator surface of SURVEY.md §2.1-2.7.

Each Spark implementation is written plan-first: filters before joins
(pushdown), explicit column pruning, broadcast hints on dimension tables,
exact decimal aggregation for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import davg, dsum, t

# --------------------------------------------------------------------- q1
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum(disc_price, 8).alias("sum_disc_price"),
        dsum(charge, 12).alias("sum_charge"),
        davg(F.col("l_quantity")).alias("avg_qty"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
        davg(F.col("l_discount")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  (SUM(l_quantity::DECIMAL(28,4)))::DOUBLE AS sum_qty,
  (SUM(l_extendedprice::DECIMAL(28,4)))::DOUBLE AS sum_base_price,
  (SUM((l_extendedprice * (1 - l_discount))::DECIMAL(28,8)))::DOUBLE AS sum_disc_price,
  (SUM((l_extendedprice * (1 - l_discount) * (1 + l_tax))::DECIMAL(28,12)))::DOUBLE AS sum_charge,
  (SUM(l_quantity::DECIMAL(28,6)))::DOUBLE / COUNT(l_quantity) AS avg_qty,
  (SUM(l_extendedprice::DECIMAL(28,6)))::DOUBLE / COUNT(l_extendedprice) AS avg_price,
  (SUM(l_discount::DECIMAL(28,6)))::DOUBLE / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------- q3
def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    cust = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-03-15").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-03-15").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, 8).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate,
  (SUM((l_extendedprice * (1 - l_discount))::DECIMAL(28,8)))::DOUBLE AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------- q5
def q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    region = t(spark, sf, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    nation = t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    supplier = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    cust = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nr = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        # "local": customer and supplier in the same nation
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(revenue, 8).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
  (SUM((l_extendedprice * (1 - l_discount))::DECIMAL(28,8)))::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------- q6
def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 8).alias("revenue"))


Q6_SQL = """
SELECT (SUM((l_extendedprice * l_discount)::DECIMAL(28,8)))::DOUBLE AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ------------------------------------------------------------- top-k sort
def top_customers_by_revenue(spark: SparkSession, sf: str) -> DataFrame:
    orders = t(spark, sf, "orders").select("o_custkey", "o_totalprice")
    cust = t(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        orders.groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice")).alias("revenue"), F.count("*").alias("n_orders"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
  (SUM(o_totalprice::DECIMAL(28,4)))::DOUBLE AS revenue, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


# ------------------------------------------------------- anti / semi joins
def customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Reference final-check anti-join (Engine.java:135-162)."""
    from ..operators.joins import anti_join

    cust = t(spark, sf, "customer").select("c_custkey", "c_name")
    orders = t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_join(cust, orders, ["c_custkey"])


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def customers_with_orders(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS semi-join (EtlDatabaseObjectSearchParams.java:166-190)."""
    from ..operators.joins import semi_join

    cust = t(spark, sf, "customer").select("c_custkey", "c_name")
    orders = t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return semi_join(cust, orders, ["c_custkey"])


CUSTOMERS_WITH_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def orphan_lineitems(spark: SparkSession, sf: str) -> DataFrame:
    """PHANTOM detector shape: fact rows with no parent
    (DatabaseObjectDAO.java:762-789)."""
    from ..operators.reconcile import phantom_records

    li = t(spark, sf, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"), "l_linenumber")
    orders = t(spark, sf, "orders").select("o_orderkey")
    return phantom_records(orders, li, ["o_orderkey"]).groupBy().agg(
        F.count("*").alias("n_orphans")
    )


ORPHAN_LINEITEMS_SQL = """
SELECT COUNT(*) AS n_orphans FROM lineitem
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
"""


# ------------------------------------------------------------- dim joins
def nation_region_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Broadcast dimension join + rollup count (shared-PK/parent-lookup
    shape, LoadRecord.java:230-304)."""
    nation = t(spark, sf, "nation")
    region = t(spark, sf, "region")
    supplier = t(spark, sf, "supplier")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_suppliers"), dsum(F.col("s_acctbal")).alias("total_acctbal"))
    )


NATION_REGION_SQL = """
SELECT r_name, COUNT(*) AS n_suppliers, (SUM(s_acctbal::DECIMAL(28,4)))::DOUBLE AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# -------------------------------------------------------------- set ops
def priority_or_bigticket_orders(spark: SparkSession, sf: str) -> DataFrame:
    """UNION distinct of two predicates (§2.7)."""
    orders = t(spark, sf, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    b = orders.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    return a.union(b).distinct()


PRIORITY_OR_BIGTICKET_SQL = """
SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
"""


# ---------------------------------------------------------- min/max probe
def orders_pk_probe(spark: SparkSession, sf: str) -> DataFrame:
    """min/max PK probe (DatabaseObjectDAO.java:647-693) + counts."""
    return t(spark, sf, "orders").agg(
        F.min("o_orderkey").alias("min_pk"),
        F.max("o_orderkey").alias("max_pk"),
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


ORDERS_PK_PROBE_SQL = """
SELECT MIN(o_orderkey) AS min_pk, MAX(o_orderkey) AS max_pk,
       COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
"""


def open_order_gap_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """DETECT_GAPES re-expressed scalably (operators/windows.py): gaps in the
    open-order key space found by bucketed distinct-count vs span."""
    from ..operators.windows import gap_buckets

    open_orders = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "O")
    return gap_buckets(open_orders, "o_orderkey", bucket_size=256)


OPEN_ORDER_GAPS_SQL = """
WITH b AS (
  SELECT DISTINCT o_orderkey AS id, (o_orderkey // 256)::BIGINT AS bucket
  FROM orders WHERE o_orderstatus = 'O')
SELECT bucket, MIN(id) AS min_id, MAX(id) AS max_id, COUNT(DISTINCT id) AS n_ids,
       (MAX(id) - MIN(id) + 1) - COUNT(DISTINCT id) AS missing_in_bucket
FROM b GROUP BY bucket
HAVING (MAX(id) - MIN(id) + 1) - COUNT(DISTINCT id) > 0
"""

def urgent_or_building_orders(spark: SparkSession, sf: str) -> DataFrame:
    """selfJoinTables filter-join (EtlDatabaseObjectSearchParams.java:44-91):
    LEFT aux branches OR-combined — an order passes if it's urgent OR its
    customer is in BUILDING; aux tables contribute predicates only."""
    from ..operators.joins import filter_join

    orders = t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("u_orderkey")
    )
    building = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("b_custkey")
    )
    out = filter_join(
        orders,
        [
            (urgent, [F.col("o_orderkey") == F.col("u_orderkey")], "left"),
            (building, [F.col("o_custkey") == F.col("b_custkey")], "left"),
        ],
    )
    return out.select("o_orderkey").distinct()


URGENT_OR_BUILDING_SQL = """
SELECT DISTINCT o_orderkey FROM orders
WHERE o_orderpriority = '1-URGENT'
   OR EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
"""


def orders_with_nation_defaults(spark: SparkSession, sf: str) -> DataFrame:
    """Parent-lookup broadcast join with defaultValueDueInconsistency
    (LoadRecord.java:230-304): resolve customer→nation, default 'UNKNOWN'."""
    from ..operators.joins import lookup_join

    orders = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    step1 = lookup_join(orders, cust, ["o_custkey"], default_values={})
    step2 = lookup_join(step1, nation, ["c_nationkey"], default_values={"n_name": "UNKNOWN"})
    return step2.groupBy("n_name").agg(F.count("*").alias("n_orders"))


ORDERS_NATION_DEFAULTS_SQL = """
SELECT COALESCE(n_name, 'UNKNOWN') AS n_name, COUNT(*) AS n_orders
FROM orders
LEFT JOIN customer ON c_custkey = o_custkey
LEFT JOIN nation ON n_nationkey = c_nationkey
GROUP BY 1
"""


# --------------------------------------------------------------------- q14
def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact⋈dim join —
    promo (p_type = 'ECONOMY') revenue share of one ship-month. The part
    dimension broadcasts; lineitem is filtered before the join (pushdown) and
    never shuffles."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-02-01")
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = t(spark, sf, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "ECONOMY", disc_price).otherwise(F.lit(0.0))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        F.round(F.lit(100.0) * dsum(promo, 8) / dsum(disc_price, 8), 6).alias("promo_revenue_pct"),
        dsum(disc_price, 8).alias("total_revenue"),
    )


Q14_SQL = """
SELECT ROUND(100.0
         * (SUM(CASE WHEN p_type = 'ECONOMY'
                     THEN (l_extendedprice * (1 - l_discount))::DECIMAL(28,8)
                     ELSE 0.0::DECIMAL(28,8) END))::DOUBLE
         / (SUM((l_extendedprice * (1 - l_discount))::DECIMAL(28,8)))::DOUBLE,
       6) AS promo_revenue_pct,
       (SUM((l_extendedprice * (1 - l_discount))::DECIMAL(28,8)))::DOUBLE AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-02-01'
"""


def part_brand_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(brand, type) revenue and volume — dimension-attribute rollup of
    the fact table through a broadcast join."""
    li = t(spark, sf, "lineitem").select("l_partkey", "l_extendedprice", "l_discount", "l_quantity")
    part = t(spark, sf, "part").select("p_partkey", "p_brand", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.groupBy("p_brand", "p_type").agg(
        dsum(disc_price, 8).alias("revenue"),
        dsum(F.col("l_quantity")).alias("total_qty"),
        F.count("*").alias("n_lineitems"),
    )


PART_BRAND_REVENUE_SQL = """
SELECT p_brand, p_type,
  (SUM((l_extendedprice * (1 - l_discount))::DECIMAL(28,8)))::DOUBLE AS revenue,
  (SUM(l_quantity::DECIMAL(28,4)))::DOUBLE AS total_qty,
  COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_type
"""


def customer_shared_pk_join(spark, sf: str):
    """shared_pk_join exercised end-to-end (patient⋈person analog,
    api:conf/interfaces/TableConfiguration.java:1324-1347): two vertical
    slices of customer sharing c_custkey rejoined into the full row — a
    plain equi-join Catalyst plans as it likes (broadcast/SMJ/AQE)."""
    from ..operators.joins import shared_pk_join
    from .base import t as _t

    cust = _t(spark, sf, "customer")
    a = cust.select("c_custkey", "c_name", "c_nationkey")
    b = cust.select("c_custkey", "c_acctbal", "c_mktsegment")
    return shared_pk_join(a, b, ["c_custkey"])


CUSTOMER_SHARED_PK_SQL = """
SELECT a.c_custkey, a.c_name, a.c_nationkey, b.c_acctbal, b.c_mktsegment
FROM customer a JOIN customer b ON a.c_custkey = b.c_custkey
"""


QUERIES = {
    "urgent_or_building_orders": urgent_or_building_orders,
    "customer_shared_pk_join": customer_shared_pk_join,
    "q14_promo_revenue": q14_promo_revenue,
    "part_brand_revenue": part_brand_revenue,
    "orders_with_nation_defaults": orders_with_nation_defaults,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "top_customers_by_revenue": top_customers_by_revenue,
    "customers_without_orders": customers_without_orders,
    "customers_with_orders": customers_with_orders,
    "orphan_lineitems": orphan_lineitems,
    "nation_region_rollup": nation_region_rollup,
    "priority_or_bigticket_orders": priority_or_bigticket_orders,
    "orders_pk_probe": orders_pk_probe,
    "open_order_gap_buckets": open_order_gap_buckets,
}

ORACLES = {
    "urgent_or_building_orders": URGENT_OR_BUILDING_SQL,
    "customer_shared_pk_join": CUSTOMER_SHARED_PK_SQL,
    "q14_promo_revenue": Q14_SQL,
    "part_brand_revenue": PART_BRAND_REVENUE_SQL,
    "orders_with_nation_defaults": ORDERS_NATION_DEFAULTS_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "top_customers_by_revenue": TOP_CUSTOMERS_SQL,
    "customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "customers_with_orders": CUSTOMERS_WITH_ORDERS_SQL,
    "orphan_lineitems": ORPHAN_LINEITEMS_SQL,
    "nation_region_rollup": NATION_REGION_SQL,
    "priority_or_bigticket_orders": PRIORITY_OR_BIGTICKET_SQL,
    "orders_pk_probe": ORDERS_PK_PROBE_SQL,
    "open_order_gap_buckets": OPEN_ORDER_GAPS_SQL,
}
