"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship TPC-H-shaped query at sf0.001; ``queries`` /
``oracle_sql`` expose the full operator registry from kgforge.queries
(SURVEY.md section 2 driver-check keys; entries with no oracle are
non-SQL-expressible and get the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue by nation/year over the sf0.001 star schema
    (scan -> broadcast dim joins -> agg -> order)."""
    sf = "/root/testdata/sf0.001"

    def t(name: str) -> DataFrame:
        return spark.read.parquet(f"{sf}/{name}.parquet")

    li, o, c, n, r = (t(x) for x in ("lineitem", "orders", "customer", "nation", "region"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name", F.year("o_orderdate").alias("y"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name", "y")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgforge.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from kgforge.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
