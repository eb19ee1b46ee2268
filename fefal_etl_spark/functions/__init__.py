"""Scalar column-expression factories (SURVEY.md §2.9)."""

from fefal_etl_spark.functions.text import (  # noqa: F401
    ENTITY_PREFIX_PATTERNS,
    SENTENCE_SPLIT_REGEX,
    clean_header,
    contains_any,
    entity_key,
    extract_content_in_brackets,
    normalize_text,
    normalize_text_udf,
    py_normalize_text,
    remove_entity_prefixes,
    split_sentences,
    split_sentences_portable,
    strip_accents,
    truncate_ellipsis,
)
from fefal_etl_spark.functions.encodings import (  # noqa: F401
    encode_existe_responsavel,
    encode_sim_nao_null,
    encode_sim_nao_tristate,
    is_numeric_string,
)
from fefal_etl_spark.functions.temporal import (  # noqa: F401
    coalesce_submission,
    duration_seconds,
    format_date,
    to_lisbon,
    to_timestamp_coerce,
)
from fefal_etl_spark.functions.numeric import (  # noqa: F401
    rescale_to_100,
    round_half_even,
    to_numeric_coerce,
    validate_numeric,
)
