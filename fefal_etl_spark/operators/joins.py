"""Join operators (SURVEY.md §2.3 J1–J5).

The reference implements all joins as Python dict lookups (broadcast hash
left-outer joins in disguise). Here they are declarative DataFrame joins with
explicit ``broadcast()`` hints on the dimension side — at 100 TB the fact
side streams through map tasks with zero shuffle while the KB–MB-sized dims
ship once per executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fefal_etl_spark.functions.text import (
    entity_key,
    normalize_text,
    remove_entity_prefixes,
)


def resolve_entities(
    survey: DataFrame,
    registry: DataFrame,
    name_col: str = "nome_entidade",
    type_col: str = "tipo_entidade",
    registry_name: str = "ent_nome",
    registry_type: str = "ent_tipo",
    registry_id: str = "id_entidades",
    out_id: str = "id_entidade",
) -> DataFrame:
    """J1 — entity-resolution broadcast left join (etl_ui.py:86-95).

    Both sides build the composite key ``norm(prefix_stripped(name)) || '||'
    || norm(type)``; misses yield NULL ``id_entidade`` (the "unmatched"
    branch). The registry (~thousands of rows) is broadcast.

    Duplicate keys on the registry side would fan out survey rows (a dict
    would keep the last); callers should dedup the registry first — the
    reference's registry has unique keys by construction.
    """
    reg = registry.select(
        F.col(registry_id).alias(out_id),
        entity_key(
            remove_entity_prefixes(F.col(registry_name)),
            normalize_text(F.col(registry_type)),
        ).alias("__entity_key"),
    ).dropDuplicates(["__entity_key"])
    keyed = survey.withColumn(
        "__entity_key",
        entity_key(
            remove_entity_prefixes(F.col(name_col)), normalize_text(F.col(type_col))
        ),
    )
    return keyed.join(F.broadcast(reg), on="__entity_key", how="left").drop(
        "__entity_key"
    )


def lookup_dim(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_id: str,
    how: str = "left",
) -> DataFrame:
    """J2 — dimension-key lookup join after unpivot (etl_ui.py:437-464 etc.).

    Equality join on a normalized name; dim side broadcast.
    """
    dim_small = F.broadcast(
        dim.select(F.col(dim_key).alias("__dim_key"), F.col(dim_id)).dropDuplicates(
            ["__dim_key"]
        )
    )
    return facts.join(
        dim_small, on=facts[fact_key] == dim_small["__dim_key"], how=how
    ).drop("__dim_key")


def prefix_join(
    answers: DataFrame,
    tipos: DataFrame,
    answer_col: str,
    tipo_desc: str = "descricao_tipo_disp",
    tipo_id: str = "id_tipo_disp",
) -> DataFrame:
    """J4 — availability-type prefix theta-join (etl_ui.py:613-621).

    An answer column name matches type *t* when
    ``norm(colname).startswith(norm(t + " -"))``. Executed as a
    BroadcastNestedLoopJoin — correct and cheap because the build side is a
    handful of availability types; never use for large build sides.

    When several types prefix-match, the reference keeps the first match in
    dict order; we keep the longest prefix (deterministic, order-free) —
    equivalent unless one type string is a prefix of another.
    """
    t = F.broadcast(
        tipos.select(
            F.col(tipo_id).alias("__tipo_id"),
            normalize_text(F.concat(F.col(tipo_desc), F.lit(" -"))).alias("__prefix"),
        )
    )
    joined = answers.join(
        t, on=normalize_text(F.col(answer_col)).startswith(t["__prefix"]), how="left"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*[answers[c] for c in answers.columns])
        .orderBy(F.length("__prefix").desc_nulls_last())
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "__prefix")
        .withColumnRenamed("__tipo_id", tipo_id)
    )


def anti_join_new_keys(new: DataFrame, existing: DataFrame, on: str | list[str]) -> DataFrame:
    """J5 — rows of ``new`` whose key is absent from ``existing``
    (etl_ui.py:446-448): the "which dim values must be inserted" primitive.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return new.join(existing.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
