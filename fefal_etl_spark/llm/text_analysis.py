"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.12 E3).

All metrics are native column expressions (JVM-side, whole-stage codegen) —
no Python in the hot path. At 100 TB these run as a single narrow projection
over the corpus scan: zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fefal_etl_spark.functions.text import ws_trim

# Small built-in stopword marker sets for the n-gram/stopword language-ID
# heuristic. Deliberately tiny and deterministic — this is a cheap router,
# not a classifier; swap in fastText-style models via the pandas_udf hook
# when available.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "es": ("el", "la", "los", "que", "y", "es"),
    "pt": ("o", "a", "de", "que", "nao", "uma"),
}

# BPE-ish pre-tokenization: letter runs, digit runs, or single
# non-alphanumeric glyphs — the GPT-2 pre-tokenizer shape without the
# unicode categories (kept RE2-compatible for oracle parity).
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is")


def words(col: Column) -> Column:
    """Whitespace tokenization to an array column."""
    return F.split(F.trim(col), r"\s+")


def nonempty_words(col: Column) -> Column:
    """Lowercased whitespace tokenization with empty tokens dropped — THE
    tokenizer every corpus statistic in this package shares (and every SQL
    oracle replays as ``list_filter(regexp_split_to_array(trim(lower(x)),
    '\\s+'), t -> t <> '')``). One definition: a tokenization tweak lands
    everywhere at once instead of de-syncing six inlined copies."""
    return F.filter(
        F.split(F.trim(F.lower(col)), r"\s+"), lambda w: w != ""
    )


def word_count(col: Column) -> Column:
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(words(col))).cast(
        "long"
    )


def token_count(col: Column) -> Column:
    """Regex token count (BPE-ish pre-tokenizer granularity)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0)).cast("long")


def stopword_count(col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(
        F.filter(words(F.lower(col)), lambda w: F.array_contains(sw, w))
    ).cast("long")


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring feature block: length, word/token counts, stopword and
    punctuation ratios, mean word length. One narrow projection.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_words = word_count(t)
    n_stop = stopword_count(t)
    n_punct = punct_count(t)
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("n_tokens", token_count(t))
        .withColumn(
            "stopword_ratio",
            F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "mean_word_len",
            F.when(
                n_words > 0, (n_chars - (n_words - 1)).cast("double") / n_words
            ).otherwise(F.lit(0.0)),
        )
    )


def language_id(col: Column, out_scores: bool = False):
    """Marker-stopword language ID: count marker hits per language, argmax
    with a fixed priority order on ties (en > de > es > pt).

    Returns the predicted-language Column, or (pred, {lang: score_col}) when
    ``out_scores``.
    """
    low_words = words(F.lower(col))

    def marker_score(markers: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(low_words, lambda w: F.array_contains(arr, w))).cast(
            "long"
        )

    scores = {lang: marker_score(m) for lang, m in LANG_MARKERS.items()}
    order = list(LANG_MARKERS)  # priority order for ties: en > de > es > pt
    expr = F.lit("und")
    for i in range(len(order) - 1, -1, -1):
        lang = order[i]
        cond = scores[lang] > 0
        for later in order[i + 1 :]:
            cond = cond & (scores[lang] >= scores[later])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    # NB: built bottom-up, so earlier (higher-priority) languages win ties.
    if out_scores:
        return expr, scores
    return expr


def doc_fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the lower-trimmed text.
    Stable across engines/runs — the cheap exact-dup key (E1 fast path)."""
    return F.md5(F.lower(F.trim(col)))


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher/C4-style repetition signals per document:

    - ``dup_line_frac``: fraction of lines that are repeats of an earlier
      line (boilerplate/navigation detector) — pure array expressions,
      narrow.
    - ``top_word_frac``: share of all words taken by the single most
      frequent word (degenerate-text detector) — explode + two
      aggregations keyed on the doc id; at 100 TB this is the layout you
      want anyway (map-side combine collapses each partition to one row
      per (doc, word) before the shuffle).

    Returns (id, n_lines, dup_line_frac, top_word_frac).
    """
    lines = F.split(F.col(text_col), "\n")
    line_stats = df.select(F.col(id_col), lines.alias("__lines")).select(
        F.col(id_col),
        F.size("__lines").alias("n_lines"),
        (
            1.0
            - F.size(F.array_distinct("__lines"))
            / F.size("__lines").cast("double")
        ).alias("dup_line_frac"),
    )
    word_rows = df.select(
        F.col(id_col), F.explode(words(F.lower(F.col(text_col)))).alias("w")
    ).filter(F.col("w") != "")
    word_counts = word_rows.groupBy(id_col, "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    top_word = word_counts.groupBy(id_col).agg(
        (F.max("c").cast("double") / F.sum("c")).alias("top_word_frac")
    )
    return line_stats.join(top_word, on=id_col, how="left")


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing rolling-hash fingerprints over word ``k``-grams (Schleimer
    et al., SIGMOD 2003): hash every k-gram, keep the minimum hash of each
    length-``window`` sliding window of consecutive k-gram hashes; the
    distinct mins are the document's fingerprints, returned exploded as
    ``(id_col, fp)`` rows. Any shared run of ``window + k - 1`` words
    between two documents is guaranteed to share a fingerprint — the
    partial-overlap detector that whole-doc hashing (``doc_fingerprint``)
    can't provide.

    DataFrame-native equivalent of a Rabin-Karp rolling hash: the same
    k-gram hash set computed positionally (``transform`` over an index
    ``sequence``) instead of per-character carry state — embarrassingly
    parallel, whole-stage-codegen'd, zero Python, zero shuffles. Hashes are
    16-hex-char md5 prefixes so ``array_min`` (lexicographic) is
    engine-portable.

    Deliberately staged as THREE projections (words → k-gram hashes →
    window mins), not one nested expression: Spark performs no
    common-subexpression elimination inside higher-order-function lambdas,
    so a single fused expression re-evaluates the whole hash array per
    window element — O(n²) md5 calls; measured 60× slower at 500 docs.
    Separate multi-referenced aliases block CollapseProject, so each array
    materializes once per row.

    Documents with fewer than ``k`` words yield no rows; fewer k-grams than
    ``window`` → one fingerprint (min of all), per the winnowing paper.
    """
    ws = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: x != "")
    words_df = df.select(id_col, ws.alias("_ws")).filter(F.size("_ws") >= k)
    hashes = F.transform(
        F.sequence(F.lit(1), F.size("_ws") - F.lit(k - 1)),
        lambda i: F.substr(
            F.md5(F.concat_ws(" ", F.slice(F.col("_ws"), i, k))), F.lit(1), F.lit(16)
        ),
    )
    hashed_df = words_df.select(id_col, hashes.alias("_hs"))
    mins = F.when(
        F.size("_hs") >= window,
        F.transform(
            F.sequence(F.lit(1), F.size("_hs") - F.lit(window - 1)),
            lambda j: F.array_min(F.slice(F.col("_hs"), j, window)),
        ),
    ).otherwise(F.array(F.array_min("_hs")))
    return hashed_df.select(id_col, mins.alias("_mins")).select(
        id_col, F.explode(F.array_distinct("_mins")).alias("fp")
    )


# --------------------------------------------------------------------------
# TF-IDF — classic salient-term extraction over a corpus
# --------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
) -> DataFrame:
    """Top-``top_n`` TF-IDF terms per document (alpha tokens, natural-log
    idf = ln(N/df)).

    Plan (round 12 — VERDICT r11 item 3): one explode over the corpus →
    (doc, term) counts (shuffle on the composite key), document
    frequency as a COUNT WINDOW over the aggregated counts partitioned
    by term — ONE linear pipeline instead of the former
    ``tf ⋈ (tf groupBy term)`` self-join, whose duplicated tf subtree
    AQE planned as two independent query stages and executed TWICE
    (exchange reuse does not fire across AQE stage boundaries here;
    node-level metrics showed the (doc, term) partial aggregation — the
    most expensive operator — built twice per run, plus a redundant
    shuffle for the join). Corpus size N broadcasts as a one-row frame.
    Ranking is a per-doc window over ≤vocab rows. The tie order (score
    DESC, df ASC, term ASC) is total, so the output is deterministic;
    exact score ties (equal tf and df) order by term on both engines.
    """
    tokens = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("__n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .select(id_col, "rk", "term", "tf", "df", F.round("tfidf", 6).alias("tfidf"))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    word-window chunks (``chunk_words`` long, ``stride`` apart → the last
    ``chunk_words - stride`` words repeat in the next chunk), the standard
    preprocessing step for embedding / training-example generation.

    Pure expressions — a sequence of window starts exploded against a
    slice of the materialized words array (the words array is projected
    ONCE before the explode; see the shingles() CSE note). Zero shuffles:
    chunking is a narrow fan-out that runs at scan speed and preserves the
    input partitioning for whatever consumes the chunks.

    Output: (id, chunk_pos, chunk, n_words) with chunk_pos = 1-based word
    offset of the chunk start; partial tail chunks are kept.
    """
    w = F.split(ws_trim(F.col(text_col)), r"\s+")
    ws = df.select(F.col(id_col), w.alias("__w"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("__w"), F.lit(1)), F.lit(stride)
    )
    chunk = F.slice(F.col("__w"), F.col("chunk_pos"), chunk_words)
    return (
        ws.select(F.col(id_col), "__w", F.explode(starts).alias("chunk_pos"))
        .select(
            F.col(id_col),
            "chunk_pos",
            F.concat_ws(" ", chunk).alias("chunk"),
            F.size(chunk).alias("n_words"),
        )
        .filter(F.col("chunk") != "")
    )


def vocab_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 25,
) -> DataFrame:
    """Vocabulary coverage scoring: build the corpus-level top-``vocab_size``
    word vocabulary (by total occurrence count; ties → lexicographically
    first — a deterministic, engine-portable rank) and score every document
    by the fraction of its tokens covered by that vocabulary. Low coverage
    flags out-of-domain / noisy / wrong-language documents against the
    corpus's own distribution — the cheap first-pass quality gate before
    model-based filters.

    Two aggregations, both map-side-combinable: (1) token counts shuffle
    by WORD (vocabulary-sized cardinality, tiny), top-k via one window
    over that small frame; (2) per-doc coverage shuffles by doc id over
    (doc, in_vocab) partial counts. The vocabulary broadcast-joins back —
    the corpus is never shuffled by content. Coverage = in/total is one
    double division of two exact integers (correctly rounded IEEE — both
    engines agree bit-for-bit).

    Output: (id, n_tokens, n_in_vocab, coverage), docs with ≥1 token.
    """
    toks = df.select(
        F.col(id_col), F.explode(words(F.lower(F.col(text_col)))).alias("__t")
    ).filter(F.col("__t") != "")
    # top-K via orderBy().limit() = TakeOrderedAndProject (per-partition
    # heap + driver merge), never an unpartitioned row_number window that
    # would sort the whole vocabulary in one partition
    vocab = (
        toks.groupBy("__t")
        .agg(F.count("*").alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col("__t").asc())
        .limit(vocab_size)
        .select(F.col("__t").alias("__v"))
    )
    return (
        toks.join(F.broadcast(vocab), toks["__t"] == vocab["__v"], "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.count("__v").cast("long").alias("n_in_vocab"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_in_vocab",
            (F.col("n_in_vocab") / F.col("n_tokens")).alias("coverage"),
        )
    )


def token_diversity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Lexical-diversity scoring (the Gopher-family repetitiousness
    signals): per document, token count, distinct-token count, type-token
    ratio, and unigram Shannon entropy (bits). Low TTR/entropy = degenerate
    repetitive text; the cheap gate before perplexity-based filters.

    One (doc, word) count aggregation then one per-doc roll-up — both
    map-side-combinable, shuffle keyed by doc id.

    Exactness: n_tokens/n_types/ttr are integer counts and one correctly
    rounded division — bit-exact across engines. Entropy sums
    ``c·log2(c)`` over a doc's distinct words in engine-dependent order,
    so the last few double ulps may differ; it is rounded to 6 decimals on
    both sides, which resolves identically unless a true value sits within
    ~1e-15 of a rounding boundary (same documented boundary caveat as
    ``semdedup_pairs``' cosine threshold).
    """
    toks = df.select(
        F.col(id_col), F.explode(words(F.lower(F.col(text_col)))).alias("__t")
    ).filter(F.col("__t") != "")
    per_word = toks.groupBy(id_col, "__t").agg(F.count("*").alias("__c"))
    return per_word.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        (F.count("*") / F.sum("__c")).alias("ttr"),
        F.round(
            F.log2(F.sum("__c"))
            - F.sum(F.col("__c") * F.log2("__c")) / F.sum("__c"),
            6,
        ).alias("entropy"),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-unigram log-probability scoring — the cheap stand-in for the
    CCNet/Gopher perplexity gate: learn the corpus's own unigram
    distribution p(w), then score each document by its mean
    −log₂ p(w) over tokens. Documents far from the corpus distribution
    (noise, wrong language, boilerplate-free gibberish) score high; fluent
    in-domain text scores low. A real LM refines this; the dataflow — fit
    a distribution on one pass, broadcast it, score on a second — is
    identical.

    Shuffle profile: the model fit moves one row per distinct word
    (vocabulary cardinality); the scoring pass broadcast-joins the model
    and aggregates per doc with map-side partials. Mean −log₂ p sums
    doubles in engine order → rounded to 6 decimals on both sides (the
    documented boundary caveat, as in ``token_diversity``).
    """
    toks = df.select(
        F.col(id_col), F.explode(words(F.lower(F.col(text_col)))).alias("__t")
    ).filter(F.col("__t") != "")
    model = toks.groupBy("__t").agg(F.count("*").alias("__c"))
    total = model.agg(F.sum("__c").alias("__n"))
    scored = (
        toks.join(F.broadcast(model), "__t")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            (-F.log2(F.col("__c") / F.col("__n"))).alias("__nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg("__nll"), 6).alias("mean_nll"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """The counting step of byte-pair-encoding tokenizer training (Sennrich
    et al. 2016): adjacent character-pair frequencies weighted by word
    frequency, the statistic each BPE merge round maximizes.

    Classic BPE iterates on the VOCABULARY (word, freq), which is tiny
    after the corpus collapse — so the distributed work is exactly one
    vocab-cardinality shuffle (word counts with map-side combine); the
    per-word pair explosion then runs on the collapsed vocab, not the
    corpus, and the final pair aggregation is alphabet²-bounded. This is
    the correct 100 TB decomposition: corpus → vocab once, train merges on
    vocab (driver- or executor-side, both fine at |V| ≈ 10⁶), broadcast
    the merge table back to tokenize.

    Returns the ``top_n`` (pair, n) rows, deterministically tie-broken by
    pair string — the next merge candidate list."""
    vocab = (
        df.select(F.explode(nonempty_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = vocab.filter(F.length("w") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substr(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(top_n)
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram language-model scoring — one rung up the
    perplexity-gate ladder from :func:`unigram_logprob`: each token after
    the first is scored by p = λ·p(w|prev) + (1−λ)·p(w) (Jelinek-Mercer
    interpolation, the classic smoothing that never assigns zero to an
    unseen bigram because the unigram term floors it); the first token
    backs off to the unigram alone. Documents whose word ORDER is unlike
    the corpus (shuffled text, concatenated fragments, tables) now score
    high even when their vocabulary is in-domain — the failure mode a
    unigram gate is blind to.

    Shuffle profile: unigram fit at vocab cardinality; bigram fit +
    context totals at observed-bigram cardinality (the model join back to
    the token stream is keyed identically to the fit, so AQE reuses the
    exchange); scoring aggregates per doc with map-side partials. The
    bigram model is NOT force-broadcast — at 100 TB observed bigrams
    outgrow the driver and the co-partitioned hash join is the right
    plan. Mean −log₂ p is engine-order summation → round-6 both sides
    (the documented caveat shared with ``unigram_logprob``).
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(nonempty_words(F.col(text_col))).alias("pos", "w"),
    )
    w_ord = Window.partitionBy(id_col).orderBy("pos")
    stream = toks.withColumn("prev", F.lag("w").over(w_ord))
    uni = stream.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    total = uni.agg(F.sum("cu").alias("n"))
    big = (
        stream.filter(F.col("prev").isNotNull())
        .groupBy("prev", "w")
        .agg(F.count(F.lit(1)).alias("cbg"))
    )
    ctx = big.groupBy("prev").agg(F.sum("cbg").alias("cctx"))
    scored = (
        stream.join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(total))
        .join(big, ["prev", "w"], "left")
        .join(ctx, "prev", "left")
    )
    p_uni = F.col("cu").cast("double") / F.col("n")
    p_int = (
        F.lit(lam) * (F.col("cbg").cast("double") / F.col("cctx"))
        + F.lit(1.0 - lam) * p_uni
    )
    nll = F.when(F.col("prev").isNull(), -F.log2(p_uni)).otherwise(
        -F.log2(p_int)
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg(nll), 6).alias("mean_nll"),
    )


def pmi_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Pointwise-mutual-information collocation mining — the corpus
    statistic behind multi-word-expression detection and phrase-aware
    tokenization (word2vec's phrase pass uses the same score):
    PMI(a,b) = log₂( p(ab) / (p(a)·p(b)) ) over adjacent word pairs,
    gated by ``min_count`` (PMI is noise-dominated on rare pairs).

    Shuffle profile: one doc-keyed window for adjacency, then unigram and
    bigram aggregations at vocab/observed-bigram cardinality; the two
    marginal joins hit the tiny count tables. Output ordering is by PMI
    ROUNDED to 6 with a (w1, w2) tiebreak — a raw double sort would let
    one-ulp engine differences reorder the top-N cut."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(nonempty_words(F.col(text_col))).alias("pos", "w"),
    )
    w_ord = Window.partitionBy(id_col).orderBy("pos")
    stream = toks.withColumn("prev", F.lag("w").over(w_ord))
    uni = stream.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    n_tot = uni.agg(F.sum("cu").alias("n"))
    big = (
        stream.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("w1"), F.col("w").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= min_count)
    )
    m_tot = (
        stream.filter(F.col("prev").isNotNull())
        .agg(F.count(F.lit(1)).alias("m"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cu").alias("ca"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cu").alias("cb"))
    pmi = F.log2(
        (F.col("cab").cast("double") / F.col("m"))
        / (
            (F.col("ca").cast("double") / F.col("n"))
            * (F.col("cb").cast("double") / F.col("n"))
        )
    )
    return (
        big.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(m_tot))
        .select(
            "w1",
            "w2",
            F.col("cab").alias("n_pair"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_n)
    )
