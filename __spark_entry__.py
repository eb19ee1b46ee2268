"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (entity-resolution join + window
dedup + grouped aggregation — J1+W2+A in one DAG, SURVEY.md §7 phase 0).
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB-oracle twins; see fefal_etl_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: resolve noisy entity names against a registry,
    dedup to the best record per entity, aggregate counts per status/region.
    """
    from pyspark.sql import functions as F

    from fefal_etl_spark.datasets import load_table
    from fefal_etl_spark.operators import classify_rows, resolve_entities

    sf_dir = "/root/testdata/sf0.001"
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    registry = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(
        F.col("n_nationkey").alias("id_entidades"),
        F.col("n_name").alias("ent_nome"),
        F.col("r_name").alias("ent_tipo"),
    )
    probe = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            "c_acctbal",
            F.when(
                customer.c_custkey % 13 == 0,
                F.concat(F.lit("Unknown Entity "), customer.c_custkey),
            )
            .otherwise(F.concat(F.lit("  Município de "), nation.n_name, F.lit("  ")))
            .alias("nome_entidade"),
            F.lower(region.r_name).alias("tipo_entidade"),
        )
    )
    resolved = resolve_entities(probe, registry)
    classified = classify_rows(
        resolved,
        id_col="id_entidade",
        order_by=[F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
    )
    return classified.groupBy("status", "id_entidade").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_bal"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fefal_etl_spark.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from fefal_etl_spark.queries import get_oracles

    return get_oracles()
