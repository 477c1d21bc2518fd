"""Driver queries exercising the config-driven ETL surface: @param
templating, extraQueryDataSource chaining, and conditional parent lookup —
the reference's correlated-query config (api:conf/QueryDataSourceConfig.java,
api:conf/PreparedQuery.java, README.md:228-261) executed as Catalyst joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import EtlItemConfig, build_item_frame
from ..prepared import QuerySourceConfig

_MIN_PRICE = 400_000.0


def orders_enriched_querysource(spark: SparkSession, sf: str) -> DataFrame:
    """Two chained extraQueryDataSources (orders → customer → nation), a
    row-bound SELECT_FIELD @param, and a config-bound @param in
    extraConditionForExtract — each per-row correlated query planned as one
    broadcast join, no per-row execution anywhere."""
    item = EtlItemConfig(
        name="qsrc_demo",
        src_path=f"{sf}/orders.parquet",
        extra_condition="o_totalprice > @min_price",
        query_sources=[
            QuerySourceConfig(
                name="cust",
                query="SELECT c_name, c_nationkey FROM customer WHERE c_custkey = @o_custkey",
                resources={"customer": f"{sf}/customer.parquet"},
                required=True,
            ),
            QuerySourceConfig(
                name="nat",
                query="SELECT n_name AS nation_name, @o_orderpriority AS prio "
                "FROM nation WHERE n_nationkey = @c_nationkey",
                resources={"nation": f"{sf}/nation.parquet"},
            ),
        ],
    )
    df = build_item_frame(spark, item, params={"min_price": _MIN_PRICE})
    return df.select("o_orderkey", "c_name", "nation_name", "prio")


ORDERS_ENRICHED_SQL = f"""
SELECT o.o_orderkey, c.c_name, n.n_name AS nation_name, o.o_orderpriority AS prio
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_totalprice > {_MIN_PRICE!r}
"""

QUERIES = {"orders_enriched_querysource": orders_enriched_querysource}
ORACLES = {"orders_enriched_querysource": ORDERS_ENRICHED_SQL}
