"""End-to-end corpus curation (SURVEY.md §2.12 capstone): the standard
LLM-pretraining preprocessing chain as ONE lazy DataFrame DAG —

    quality gate (length/stopword stats)
    → repetition gate (dup-line fraction, top-word dominance)
    → exact-dedup keeper selection (md5 fingerprint window)
    → deterministic stratified sample (per-language rates)

Composing the individual operators keeps every stage declarative, so
Catalyst fuses the narrow gates into the scan projection and the whole
pipeline costs: one corpus scan + the word-dominance aggregation + the
dedup window shuffle. Nothing materializes between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fefal_etl_spark.llm.sampling import stratified_sample
from fefal_etl_spark.llm.text_analysis import (
    doc_fingerprint,
    quality_features,
)


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_words: int = 10,
    max_dup_line_frac: float = 0.3,
    max_top_word_frac: float = 0.2,
    sample_fractions: dict[str, float] | None = None,
    default_fraction: float = 0.25,
    salt: str = "curate",
) -> DataFrame:
    """Returns the curated (id, lang, n_words) set. Every decision is a
    pure function of the row (plus the per-fingerprint keeper window), so
    the output is deterministic across engines and repartitionings —
    verified end-to-end against the DuckDB oracle twin."""
    # The line-repetition gate is a narrow expression, so it fuses into the
    # quality projection (one corpus scan serves both gates); only the
    # word-dominance signal needs its own explode+aggregate branch. Keeps
    # the pipeline at 2 scans instead of 3 (repetition_features standalone
    # would rescan for the line stats).
    lines = F.split(F.col(text_col), "\n")
    dup_line_frac = (
        1.0 - F.size(F.array_distinct(lines)) / F.size(lines).cast("double")
    )
    quality = (
        quality_features(df, text_col)
        .withColumn("dup_line_frac", dup_line_frac)
        .filter(
            (F.col("n_words") >= min_words)
            & (F.col("dup_line_frac") <= max_dup_line_frac)
        )
    )
    top_word = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
                "__w"
            ),
        )
        .filter(F.col("__w") != "")
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg((F.max("__c").cast("double") / F.sum("__c")).alias("top_word_frac"))
    )
    gated = quality.join(top_word, on=id_col).filter(
        F.col("top_word_frac") <= max_top_word_frac
    )
    keeper_w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    deduped = (
        gated.withColumn("__fp", doc_fingerprint(F.col(text_col)))
        .withColumn("__rk", F.row_number().over(keeper_w))
        .filter(F.col("__rk") == 1)
    )
    sampled = stratified_sample(
        deduped,
        key_col=id_col,
        strata_col=lang_col,
        fractions=sample_fractions or {},
        default_fraction=default_fraction,
        salt=salt,
    )
    return sampled.select(id_col, lang_col, "n_words")


# --------------------------------------------------------------------------
# PII scrubbing — standard pretraining-corpus redaction pass
# --------------------------------------------------------------------------

# RE2-safe patterns (no lookaround/backreferences) so the same regex text
# runs in Spark (Java regex) and any RE2-based oracle/engine identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d[\d ]{6,}\d"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails/phone numbers from ``text_col``; adds
    ``{text_col}_scrubbed`` and ``n_pii`` (match count before redaction).

    Pure narrow expressions — fuses into whatever scan feeds it; at 100 TB
    this runs map-side at parquet-read speed with zero shuffles. The match
    count is taken *before* replacement so overlapping redactions can't
    hide each other.
    """
    c = F.col(text_col)
    n_pii = (
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0))
        + F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0))
    ).cast("long")
    scrubbed = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.withColumn("n_pii", n_pii).withColumn(
        f"{text_col}_scrubbed", scrubbed
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with the eval/benchmark set (the standard guard against
    eval leakage into pretraining data).

    Returns (id, n_overlap) for contaminated training docs — n_overlap =
    number of *distinct* shared n-grams. Shingles travel as JVM-native
    xxhash64 longs (8 bytes each, not ~60-byte strings; the hash is
    internal to the join, so the portable-md5 requirement of the minhash
    path doesn't apply — measured ~40% faster). The eval side is
    benchmark-sized by definition, so its distinct shingle set broadcasts:
    the training corpus is never shuffled at all — the contamination scan
    is one map-side semi-ish join at parquet-read speed, linear at 100 TB.
    """
    from fefal_etl_spark.llm.dedup import shingles

    # Train side stays NON-distinct: deduping (id, shingle) corpus-wide
    # would shuffle every shingle before the join. The broadcast join
    # filters to matched shingles first, so countDistinct dedups only the
    # (tiny) contaminated remainder — the corpus-wide shuffle disappears
    # entirely (measured ~2× at sf0.1).
    tr = shingles(
        train, id_col, text_col, n=n, as_hash=True, distinct=False,
        portable_hash=False,
    )
    ev = (
        shingles(eval_df, id_col, text_col, n=n, as_hash=True, portable_hash=False)
        .select("shingle")
        .distinct()
    )
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy(id_col)
        .agg(F.countDistinct("shingle").alias("n_overlap"))
    )


def content_defined_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    modulus: int = 16,
) -> DataFrame:
    """Content-defined chunking (the Rabin/FastCDC family, word
    granularity): a chunk boundary falls AFTER word *i* wherever the hash
    of the trailing ``window``-word run satisfies ``h % modulus == 0``.
    Because boundaries depend only on local content — never on byte
    offsets — an edit near the top of a document shifts at most the chunks
    it touches, so downstream chunk-hash dedup (storage or RAG-cache style)
    keeps matching everything after the edit; fixed-size chunking would
    re-key the whole tail. Expected chunk length ≈ ``modulus`` words.

    Production CDC adds min/max chunk-size clamps (FastCDC's normalized
    chunking); those are sequential-scan semantics deliberately out of
    scope here — the pure content rule is what keeps the operator
    expressible as windows and therefore shuffle-bounded.

    Returns (id, chunk_id, n_words, chunk_md5). Scale: ONE doc-keyed
    shuffle — the boundary flag (3-deep lag) and the running chunk counter
    share the same window sort — then a (doc, chunk) aggregation that
    reuses the doc partitioning; text never shuffles corpus-wide, and the
    rolling hash is JVM-side md5 (portable so an oracle can replay the
    boundary decisions bit-for-bit)."""
    from fefal_etl_spark.llm.text_analysis import nonempty_words

    words = df.select(
        F.col(id_col),
        F.posexplode(nonempty_words(F.col(text_col))).alias("pos", "w"),
    )
    w_ord = Window.partitionBy(id_col).orderBy("pos")
    lag_cols = [F.lag("w", d).over(w_ord) for d in range(window - 1, 0, -1)]
    run = F.concat_ws(" ", *lag_cols, F.col("w"))
    h = F.conv(F.substring(F.md5(run), 1, 8), 16, 10).cast("long")
    boundary = F.when(
        (F.col("pos") >= window - 1) & (h % modulus == 0), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = words.select(
        id_col, "pos", "w", boundary.alias("b")
    )
    # chunk id of word j = boundaries strictly before j (frame ends 1 PRECEDING)
    w_prior = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    chunked = flagged.select(
        id_col,
        "pos",
        "w",
        F.coalesce(F.sum("b").over(w_prior), F.lit(0)).alias("chunk_id"),
    )
    ordered_text = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "w"))),
            lambda s: s["w"],
        ),
        " ",
    )
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.md5(ordered_text).alias("chunk_md5"),
        )
    )
