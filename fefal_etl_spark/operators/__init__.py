"""Relational operators (SURVEY.md §2.2–2.8)."""

from fefal_etl_spark.operators.joins import (  # noqa: F401
    anti_join_new_keys,
    asof_join,
    lookup_dim,
    prefix_join,
    range_join,
    resolve_entities,
)
from fefal_etl_spark.operators.pandas_hooks import (  # noqa: F401
    grouped_agg_udf,
    grouped_apply,
    running_counts_stateful,
)
from fefal_etl_spark.operators.dedup import (  # noqa: F401
    ROW_KEY,
    classify_rows,
    dedup_exact,
    dedup_keep_best,
    fork_by_status,
    with_row_key,
)
from fefal_etl_spark.operators.reshape import (  # noqa: F401
    explode_sentences,
    partition_columns_by_keywords,
    unpivot,
    unpivot_availability,
    unpivot_formations,
    unpivot_interests_with_comments,
    unpivot_preferences,
)
from fefal_etl_spark.operators.upsert import (  # noqa: F401
    hash_key,
    upsert_dim_hash,
    upsert_dim_sequential,
)
