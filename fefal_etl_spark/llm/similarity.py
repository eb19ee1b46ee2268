"""Similarity search over embedding columns (SURVEY.md §2.12 E2).

Embeddings are ``array<float>`` columns. Everything here is expression-level
(``zip_with``/``aggregate`` fold inside codegen) — no UDF, no collect.

Scale design:

- **Brute-force top-k** (baseline): broadcast the (small) query set, compute
  cosine per (candidate × query) in a single narrow pass, take per-query
  top-k with a window. Cost is |corpus| × |queries| — right answer when the
  query set is small, which is the common "find neighbors of these docs"
  shape. No shuffle except the final top-k (tiny).
- **LSH buckets** (scale path): random-hyperplane sign buckets restrict
  candidates to same-bucket pairs — sub-quadratic all-pairs near-dup. The
  hyperplanes here are axis-subset signs (deterministic, engine-portable);
  swap in seeded Gaussian planes for production quality.
- **IVF-style** (scale path, two-stage): coarse-quantize to the nearest of
  √N sampled centroids (bucket column), then search only matching buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_vec(col: Column) -> Column:
    """float[] → double[] so fold arithmetic is IEEE-double end to end."""
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Returns (query_id, id, cos_sim, rk).
    """
    cand = corpus.select(
        F.col(id_col), as_double_vec(F.col(vec_col)).alias("__v")
    )
    q = queries.select(
        F.col(query_id_col), as_double_vec(F.col(vec_col)).alias("__qv")
    )
    joined = cand.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col))
    sim = cosine(F.col("__v"), F.col("__qv"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("cos_sim", sim)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rk")
    )


def sign_lsh_bucket(vec: Column, dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41)) -> Column:
    """Deterministic sign-LSH bucket: concat of sign bits at fixed axes
    (1-based). Portable across engines (no RNG)."""
    bits = [
        F.when(F.element_at(vec, d) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*bits)


def lsh_bucketed_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41),
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs near-neighbor restricted to same-sign-bucket candidates:
    (id_a < id_b, cos_sim ≥ threshold). The bucket join is the only shuffle;
    within-bucket pairs are verified with the exact cosine."""
    v = corpus.select(
        F.col(id_col),
        as_double_vec(F.col(vec_col)).alias("__v"),
    ).withColumn("bucket", sign_lsh_bucket(F.col("__v"), dims))
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("__va"), "bucket"
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"), "bucket"
    )
    pairs = a.join(b, on="bucket").filter(F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("__va"), F.col("__vb"))
    return (
        pairs.withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def gaussian_planes(
    n_tables: int, n_bits: int, dim: int, seed: int = 42
) -> list[tuple[int, int, int, float]]:
    """Seeded Gaussian hyperplanes as (table, bit, pos, weight) rows.

    Generated driver-side with a fixed-seed RNG (constants, not data — the
    planes ship inside the plan like any literal). Gaussian directions make
    the sign-collision probability the classic 1 − θ/π regardless of how the
    corpus is distributed across axes — the production upgrade over the
    axis-subset signs of :func:`sign_lsh_bucket`.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n_tables, n_bits, dim))
    return [
        (t, b, p, float(w[t, b, p]))
        for t in range(n_tables)
        for b in range(n_bits)
        for p in range(dim)
    ]


def gaussian_lsh_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 8,
    n_bits: int = 6,
    seed: int = 42,
    threshold: float = 0.9,
) -> DataFrame:
    """Multi-table sign-LSH near-neighbor pairs (OR-construction):
    a pair is a candidate if it collides in ANY of ``n_tables`` independent
    ``n_bits``-bit Gaussian sign buckets; candidates are verified with the
    exact cosine. With p = 1 − θ/π per bit, the miss probability is
    (1 − p^bits)^tables — 8×6 at cos ≥ 0.9 gives ≈ 2% expected misses
    (tests pin ≥ 0.9 measured recall on the fixture corpus).

    Shape: the projections are computed by posexploding the vectors once and
    joining the broadcast plane table, then two partial-aggregated groupBys
    assemble bit signs into per-table bucket ids — the same
    explode→aggregate formulation that measured faster than a
    tables×bits-wide aggregate for simhash (wide agg buffers fall out of
    whole-stage codegen). The only joins keyed on data are the per-table
    bucket self-join and the verify join — both sub-quadratic.
    """
    spark = corpus.sparkSession
    planes = spark.createDataFrame(
        gaussian_planes(n_tables, n_bits, dim, seed),
        "t int, b int, pos int, w double",
    )
    v = corpus.select(
        F.col(id_col), as_double_vec(F.col(vec_col)).alias("__v")
    )
    comps = v.select(
        F.col(id_col), F.posexplode("__v").alias("pos", "x")
    )
    proj = (
        comps.join(F.broadcast(planes), on="pos")
        .groupBy(id_col, "t", "b")
        .agg(F.sum(F.col("x") * F.col("w")).alias("s"))
    )
    bucket_bit = F.when(
        F.col("s") >= 0, F.expr("shiftleft(cast(1 as bigint), cast(b as int))")
    ).otherwise(F.lit(0).cast("long"))
    buckets = proj.groupBy(id_col, "t").agg(F.sum(bucket_bit).alias("bucket"))
    a = buckets.select(F.col(id_col).alias("id_a"), "t", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "t", "bucket")
    cand = (
        a.join(b, on=["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Precompute each row's norm ONCE before the pair join — the inline
    # cosine() form re-folds both norms per candidate pair (measured 6×
    # slower on the verify stage); dot/(na*nb) is the same float ops in the
    # same order, so results are bit-identical.
    vn = v.select(
        F.col(id_col), "__v", l2_norm(F.col("__v")).alias("__n")
    )
    va = vn.select(
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    vb = vn.select(
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    sim = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """Two-level IVF ANN search — the scale path end to end:

    1. coarse-quantize the corpus (:func:`ivf_assign`, done once and in
       practice persisted as the bucketed layout);
    2. probe: each query picks its ``nprobe`` nearest centroids;
    3. search ONLY vectors assigned to probed centroids — the broadcast
       probe join prunes the corpus to ~``nprobe/n_centroids`` of it before
       any cosine is computed;
    4. exact cosine + per-query top-k window on the survivors.

    Approximate by design: a true neighbor assigned to an unprobed centroid
    is missed (raise ``nprobe`` to trade cost for recall). Returns
    (query_id, id, cos_sim, rk).
    """
    assigned = ivf_assign(corpus, centroids, id_col, vec_col, centroid_id_col).select(
        F.col(id_col),
        F.col(centroid_id_col),
        as_double_vec(F.col(vec_col)).alias("__v"),
    )
    cent = centroids.select(
        F.col(centroid_id_col), as_double_vec(F.col(vec_col)).alias("__c")
    )
    q = queries.select(
        F.col(query_id_col), as_double_vec(F.col(vec_col)).alias("__qv")
    )
    qd2 = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("__c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wp = Window.partitionBy(query_id_col).orderBy(
        F.col("__d2").asc(), F.col(centroid_id_col).asc()
    )
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("__d2", qd2)
        .withColumn("__rk", F.row_number().over(wp))
        .filter(F.col("__rk") <= nprobe)
        .select(query_id_col, centroid_id_col, "__qv")
    )
    cand = assigned.join(F.broadcast(probes), on=centroid_id_col).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("cos_sim", cosine(F.col("__v"), F.col("__qv")))
        .withColumn("rk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rk")
    )


def kmeans_assignments(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means with deterministic init (vectors 0..k-1) and a FIXED
    iteration count — the iterative-algorithm template: each round is one
    broadcast argmin assignment + one per-dimension mean aggregation; the
    loop unrolls into a single lazy DAG (no driver-side data movement, no
    RDD, nothing materialized between rounds — at many iterations insert a
    checkpoint every few rounds to bound lineage depth).

    Returns final (id, centroid_id) assignments — assignments rather than
    centroid coordinates so results are robust to float summation order
    across engines (argmin gaps dwarf ~1e-15 mean differences).

    This is how the IVF centroids (`ivf_topk`) get refined in production
    instead of the sampled-vectors shortcut.
    """
    e = corpus.select(F.col(id_col), as_double_vec(F.col(vec_col)).alias("__v"))
    cent = e.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("__cid"), F.col("__v").alias("__c")
    )
    cent = _lloyd_rounds(e, cent, iters, id_col)
    return _lloyd_assign(e, cent, id_col).select(
        F.col(id_col), F.col("__cid").alias("centroid_id")
    )


def _argmin_centroid(vec: Column, cents: Column) -> Column:
    """struct(__d2, __cid) of the nearest centroid in ``cents`` (an
    array of (__cid, __c) structs): per-element squared L2 via the same
    zip_with/aggregate fold as before, argmin via ``array_sort`` on the
    (distance, cid) struct — lexicographic, so ties break on the lowest
    cid exactly like the former row_number ordering."""
    d2 = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = F.transform(
        cents,
        lambda s: F.struct(
            d2(s["__c"]).alias("__d2"), s["__cid"].alias("__cid")
        ),
    )
    return F.array_sort(scored)[0]


def _lloyd_assign(e: DataFrame, cent_df: DataFrame, id_col: str) -> DataFrame:
    """One Lloyd assignment: broadcast-argmin each e=(id, __v) row to
    its nearest cent=(__cid, __c).

    Round 12 (guide §2.4): the former shape exploded e×k rows through a
    broadcast join and ranked them with a Window partitioned by id — a
    full shuffle + sort of n·k rows PER ROUND. The centroid frame is
    k small rows, so it now collapses to ONE row carrying an array of
    (cid, vec) structs; the argmin happens map-side inside a single
    projection (`_argmin_centroid`) — identical per-pair float
    arithmetic and tie-break, ZERO exchanges per assignment."""
    cents_one = cent_df.agg(
        F.collect_list(F.struct("__cid", "__c")).alias("__cents")
    )
    best = _argmin_centroid(F.col("__v"), F.col("__cents"))
    return (
        e.join(F.broadcast(cents_one))
        .withColumn("__best", best)
        .select(
            id_col, F.col("__best.__cid").alias("__cid"), "__v"
        )
    )


def _lloyd_rounds(
    e: DataFrame, cent: DataFrame, iters: int, id_col: str
) -> DataFrame:
    """``iters`` Lloyd rounds (assign → per-dimension mean) from the
    given init; returns the refined (__cid, __c) centroid frame as one
    lazy DAG."""
    for _ in range(iters):
        assigned = _lloyd_assign(e, cent, id_col)
        cent = (
            assigned.select("__cid", F.posexplode("__v").alias("__pos", "__x"))
            .groupBy("__cid", "__pos")
            .agg(F.avg("__x").alias("__m"))
            .groupBy("__cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__m"))),
                    lambda s: s["__m"],
                ).alias("__c")
            )
        )
    return cent


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means returning CENTROID COORDINATES (centroid_id 0..k−1,
    embedding) — the model-state half `kmeans_assignments` hides (round
    11, for `IvfAnnIndex.retrain`). Init is the k LOWEST-id vectors
    (deterministic for ANY id set — a retrain reads ids from a live
    index, which need not contain 0..k−1), then the same shared Lloyd
    rounds.

    ``k`` is an UPPER bound (advice r11, documented contract): a Lloyd
    mean step drops any centroid that loses every assigned vector, so
    the result may carry fewer than k rows — standard Lloyd semantics,
    kept deliberately because the declarative oracle replays this
    exact arithmetic (a re-seeding rule would have to be mirrored
    there and adds a nondeterministic-looking branch for a case the
    deterministic lowest-id init makes rare). Callers that need a
    probe-bucket floor should check ``count()`` and retrain with a
    larger k. The returned frame is metadata-scale (≤ k rows)."""
    e = corpus.select(
        F.col(id_col), as_double_vec(F.col(vec_col)).alias("__v")
    )
    low = e.orderBy(F.col(id_col).asc()).limit(k)  # TakeOrdered, k rows
    init = low.select(
        (
            F.row_number().over(Window.orderBy(F.col(id_col).asc())) - 1
        ).alias("__cid"),
        F.col("__v").alias("__c"),
    )
    cent = _lloyd_rounds(e, init, iters, id_col)
    return cent.select(
        F.col("__cid").cast("long").alias("centroid_id"),
        F.col("__c").alias("embedding"),
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (broadcast centroids, argmin by L2). Output adds ``centroid_id`` — the
    partition key for bucketed ANN search/writes at scale."""
    cand = corpus.withColumn("__v", as_double_vec(F.col(vec_col)))
    cents_one = centroids.select(
        F.col(centroid_id_col).alias("__cid"),
        as_double_vec(F.col(vec_col)).alias("__c"),
    ).agg(F.collect_list(F.struct("__cid", "__c")).alias("__cents"))
    # same map-side argmin as _lloyd_assign (round 12): no e×k explode,
    # no per-id window shuffle — one projection over a 1-row broadcast
    best = _argmin_centroid(F.col("__v"), F.col("__cents"))
    return (
        cand.join(F.broadcast(cents_one))
        .withColumn(centroid_id_col, best["__cid"])
        .drop("__cents", "__v")
    )


def semdedup_pairs(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding space
    with k-means, then verify exact cosine only *within* clusters — the
    candidate set shrinks from N² to Σ|cluster|², same bucketed shape as
    the LSH dedups but driven by learned structure instead of random
    projections.

    Output: (id_a, id_b, centroid_id, cos_sim) for same-cluster pairs with
    cosine ≥ ``threshold``, id_a < id_b (id_a is the keeper under
    lowest-id-wins). The within-cluster verify is a per-cluster
    ``applyInPandas`` GEMM (X·Xᵀ over the cluster's vector block) — the
    canonical SemDeDup implementation: |cluster|² cosines as ONE vectorized
    matmul per cluster instead of |cluster|² interpreted HOF folds
    (measured ~10× on the bench corpus; this is the case the mandate
    reserves Pandas hooks for — built-ins can't express a blocked GEMM).

    At 100 TB: k scales with corpus size (N/1000-ish) so each cluster's
    block fits an executor comfortably; one centroid_id shuffle feeds the
    grouped map, AQE splits nothing (group = pandas unit). The k-means
    rounds are the iterative template of :func:`kmeans_assignments` — one
    lazy DAG, nothing on the driver.
    """
    import numpy as np
    import pandas as pd

    # One narrow projection persisted for the whole DAG: the unrolled
    # k-means references the corpus once per round (assign + mean agg) and
    # the verify once more — without the persist the upstream scan/union
    # replays ~8×. Tiny footprint (id + dense vector); same
    # short-lived-session persist convention as minhash_lsh_neardup.
    from fefal_etl_spark.cache import track

    base = track(
        corpus.select(
            F.col(id_col), as_double_vec(F.col(vec_col)).alias("__v")
        ).persist()
    )
    assigned = kmeans_assignments(
        base, k=k, iters=iters, id_col=id_col, vec_col="__v"
    )
    e = base.join(assigned, id_col)

    out_schema = "id_a long, id_b long, centroid_id long, cos_sim double"

    def cluster_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.stack(pdf["__v"].to_numpy()[order]).astype(np.float64)
        norms = np.linalg.norm(X, axis=1)
        sims = (X @ X.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        # threshold on a 9-dec rounding: the GEMM's summation order differs
        # from the oracle's sequential fold, so a pair within a few ulps of
        # the threshold could otherwise flip membership between engines
        # (ADVICE r2); 9 decimals is far above double noise (~1e-16·dim)
        # yet far below any meaningful similarity difference. The oracle
        # applies the same rounding in its WHERE clause.
        keep = np.round(sims[iu, ju], 9) >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "centroid_id": np.full(int(keep.sum()), pdf["centroid_id"].iloc[0]),
                "cos_sim": sims[iu, ju][keep],
            }
        )

    return e.groupBy("centroid_id").applyInPandas(cluster_pairs, out_schema)


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/IO lever for
    ANN at corpus scale (4× smaller vectors than float32, 8× than float64;
    IVF/LSH bucket scans become byte-wise): ``scale = 127 / max|v|``,
    ``q_i = round(v_i · scale)`` ∈ [−127, 127]. Zero vectors get scale 0
    and an all-zero code. Dequantization is ``q_i / scale``.

    Pure higher-order expressions (transform/array_max) — JVM-side, no
    UDF, no shuffle: quantization fuses into whatever scan or join feeds
    it. The vector is materialized in its own projection first and the
    scale in a second one, so the HOF lambdas never re-evaluate their
    inputs per element (the repo-wide HOF-CSE trap).
    """
    base = df.select(F.col(id_col), as_double_vec(F.col(vec_col)).alias("__v"))
    amax = F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x)))
    scaled = base.select(
        id_col,
        "__v",
        F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0)).alias("scale"),
    )
    q = F.transform(F.col("__v"), lambda x: F.round(x * F.col("scale")).cast("int"))
    return scaled.select(id_col, "scale", q.alias("q"))


def covariance_matrix(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Distributed covariance of an embedding column → (i, j, cov) for the
    upper triangle (1-based, i ≤ j): cov = E[x_i·x_j] − E[x_i]·E[x_j].
    The d×d covariance is the heart of PCA/whitening/Mahalanobis — the
    statistics a curation pipeline needs over the full corpus.

    Formulation: posexplode to (vec, i, x_i) components, vec-keyed
    self-join for the i ≤ j products, per-(i,j) sums — with every sum in
    DECIMAL(38,18) so partition order cannot flip low bits (the repo's
    decsum convention; both engines then perform the identical double
    arithmetic on identical exact sums). The shuffle is corpus × d²/2
    product rows — bit-exact but shuffle-heavy. At 100 TB, when bit
    parity with a SQL twin is not required, switch to per-partition numpy
    GEMM partials (d×d per partition) tree-aggregated — shuffle volume
    drops to partitions × d², the same hook `semdedup_pairs` uses.
    """
    base = df.select(F.col(id_col), as_double_vec(F.col(vec_col)).alias("__v"))
    comps = base.select(
        F.col(id_col), F.posexplode("__v").alias("i", "x")
    ).select(F.col(id_col), (F.col("i") + 1).alias("i"), "x")  # 1-based
    n_df = base.agg(F.count(F.lit(1)).alias("__n"))
    sums = comps.groupBy("i").agg(
        F.sum(F.col("x").cast("decimal(38,18)")).alias("s")
    )
    a = comps.select(F.col(id_col), F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = comps.select(F.col(id_col), F.col("i").alias("jb"), F.col("x").alias("xb"))
    prods = (
        a.join(b, on=id_col)
        .filter(F.col("ia") <= F.col("jb"))
        .groupBy(F.col("ia").alias("i"), F.col("jb").alias("j"))
        .agg(F.sum((F.col("xa") * F.col("xb")).cast("decimal(38,18)")).alias("sxy"))
    )
    si = sums.select(F.col("i").alias("__i"), F.col("s").alias("si"))
    sj = sums.select(F.col("i").alias("__j"), F.col("s").alias("sj"))
    n = F.col("__n").cast("double")
    cov = (
        F.col("sxy").cast("double") / n
        - (F.col("si").cast("double") / n) * (F.col("sj").cast("double") / n)
    )
    return (
        prods.join(F.broadcast(si), prods["i"] == F.col("__i"))
        .join(F.broadcast(sj), prods["j"] == F.col("__j"))
        .crossJoin(F.broadcast(n_df))
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            cov.alias("cov"),
        )
    )


def pca_project(
    df: DataFrame,
    n_components: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PCA projection: top-``n_components`` eigenvectors of the corpus
    covariance, each vector projected onto them → (id, pc1..pcK).

    The canonical big-data PCA split: the covariance (d×d, tiny) is
    reduced DISTRIBUTED via :func:`covariance_matrix`, the
    eigendecomposition runs driver-side in numpy (d×d — microseconds, no
    data rows involved), and the projection matrix is broadcast back as
    plan literals applied in one narrow higher-order pass. Nothing
    corpus-sized ever reaches the driver. Eigenvector sign is fixed
    (largest-|component| entry made positive) so results are
    deterministic across BLAS builds.
    """
    import numpy as np

    cov_rows = covariance_matrix(df, id_col=id_col, vec_col=vec_col).collect()
    d = max(r["j"] for r in cov_rows)
    C = np.zeros((d, d))
    for r in cov_rows:
        C[r["i"] - 1, r["j"] - 1] = r["cov"]
        C[r["j"] - 1, r["i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(C)  # ascending
    top = vecs[:, ::-1][:, :n_components]  # columns = components
    for k in range(top.shape[1]):  # deterministic sign
        pivot = np.argmax(np.abs(top[:, k]))
        if top[pivot, k] < 0:
            top[:, k] = -top[:, k]
    base = df.select(F.col(id_col), as_double_vec(F.col(vec_col)).alias("__v"))
    projs = [
        F.aggregate(
            F.zip_with(
                F.col("__v"),
                F.array(*[F.lit(float(w)) for w in top[:, k]]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"pc{k + 1}")
        for k in range(top.shape[1])
    ]
    return base.select(F.col(id_col), *projs)


def quantized_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    prefilter: int = 20,
    k: int = 5,
) -> DataFrame:
    """Two-stage ANN over int8 codes — the standard quantized-search
    recipe that makes :func:`quantize_embeddings` pay off end to end:

    1. **int8 prefilter**: score every candidate by the INTEGER dot
       product of its code against the query's code (exact 64-bit math —
       both engines agree bit-for-bit, no float-order caveat) and keep the
       top ``prefilter`` per query. At corpus scale this stage reads 4-8×
       fewer bytes than float vectors and composes with the IVF bucket
       restriction (``ivf_assign``) for the full scale path.
    2. **float re-rank**: exact cosine on the surviving candidates only,
       top ``k`` emitted.

    The query set broadcasts (benchmark-sized); the corpus is scanned
    once, codes computed on the fly here — a real deployment stores them
    (they are the compressed vector column). Output (query_id, id,
    int_score, cos_sim, rk).
    """
    def _with_codes(df, idc, vec_alias, code_alias):
        # quantization inlined as chained projections on ONE (id, vec)
        # frame — a quantize_embeddings + id-join formulation would rescan
        # and shuffle the corpus just to re-attach the float vector it
        # already read (review finding; identical codes either way)
        base = df.select(F.col(idc), as_double_vec(F.col(vec_col)).alias(vec_alias))
        amax = F.array_max(F.transform(F.col(vec_alias), lambda x: F.abs(x)))
        scaled = base.withColumn(
            "__scale",
            F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0)),
        )
        code = F.transform(
            F.col(vec_alias), lambda x: F.round(x * F.col("__scale")).cast("int")
        )
        return scaled.withColumn(code_alias, code).drop("__scale")

    cq = _with_codes(corpus, id_col, "__v", "q")
    qq = _with_codes(queries, query_id_col, "__qv", "__qq").select(
        query_id_col, "__qq", "__qv"
    )
    joined = cq.join(F.broadcast(qq), F.col(id_col) != F.col(query_id_col))
    int_score = F.aggregate(
        F.zip_with(
            F.col("q"), F.col("__qq"), lambda a, b: a.cast("long") * b.cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wpre = Window.partitionBy(query_id_col).orderBy(
        F.col("int_score").desc(), F.col(id_col).asc()
    )
    pre = (
        joined.withColumn("int_score", int_score)
        .withColumn("__prk", F.row_number().over(wpre))
        .filter(F.col("__prk") <= prefilter)
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        pre.withColumn("cos_sim", cosine(F.col("__v"), F.col("__qv")))
        .withColumn("rk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "int_score", "cos_sim", "rk")
    )


def sparse_cosine_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_pct: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """The (id, term, integer-weight) frame :func:`sparse_cosine_pairs`
    joins on — exposed separately so callers can STAGE it (one tokenize +
    two vocab shuffles once per corpus; the staged parquet read halved
    the registry query's warm time, 1.46 s → 0.71 s at sf0.1)."""
    tokens = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tf = tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * 100 <= F.col("n_docs") * max_df_pct)
        .select(
            F.col(id_col),
            "term",
            (F.col("tf") * F.expr(f"CAST({scale} AS BIGINT) DIV df")).alias("w"),
        )
    )


def sparse_cosine_index(
    w: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The threshold-INDEPENDENT prefix-filter index over an integer
    weight frame (round 10): per (id, term) row carries the original
    weight plus ``__g`` (the doc's tail L2 norm from this feature
    onward in the global rarest-first order) and ``__s`` (the AllPairs
    Σ ŵ·maxŵ tail bound). :func:`sparse_cosine_pairs` derives its
    candidate prefix, the probe side AND the verify weights from this
    ONE frame, so callers can STAGE it once per corpus (like ppjoin's
    ranked_df) — the window and the maxŵ shuffle then run once per
    fingerprint instead of twice per query call."""
    dec = "decimal(38,0)"
    norms = w.groupBy(id_col).agg(
        F.sum((F.col("w").cast(dec) * F.col("w").cast(dec))).alias(
            "norm2"
        )
    )
    nw = w.join(
        norms.select(
            id_col, F.sqrt(F.col("norm2").cast("double")).alias("__norm")
        ),
        id_col,
    ).withColumn("__nw", F.col("w").cast("double") / F.col("__norm"))
    term_stats = nw.groupBy("term").agg(
        F.max("__nw").alias("__maxw"), F.count(F.lit(1)).alias("__cnt")
    )
    feat = nw.join(term_stats, "term")
    w_rev = Window.partitionBy(id_col).orderBy(
        F.col("__cnt").desc(), F.col("term").desc()
    )
    cum = w_rev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    contrib = F.col("__nw") * F.col("__maxw")
    return feat.select(
        id_col,
        "term",
        "w",
        F.sum(contrib).over(cum).alias("__s"),
        F.sqrt(
            F.sum(F.col("__nw") * F.col("__nw")).over(cum)
        ).alias("__g"),
    )


_BLOOM_BITS = 4096  # fp ≈ (1−e^(−2·155/4096))² ≈ 0.5% at the avg doc


def _bloom_hashes():
    """The two bit positions of a term — shared by the build
    (sparse_cosine_blooms) and the probe (sparse_cosine_pairs); they
    MUST hash identically or membership breaks."""
    h1 = F.xxhash64("term").bitwiseAND(F.lit(_BLOOM_BITS - 1))
    h2 = F.xxhash64("term", F.lit(7)).bitwiseAND(F.lit(_BLOOM_BITS - 1))
    return h1, h2


def sparse_cosine_blooms(
    w: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document 4096-bit / 2-hash Bloom term sets as dense
    64-long arrays — the verify-stage pruner of
    :func:`sparse_cosine_pairs` (round 11). Exposed separately, like
    :func:`sparse_cosine_weights` / :func:`sparse_cosine_index`, so
    callers can STAGE it per corpus fingerprint instead of re-running
    the doc-keyed double aggregation on every call."""
    h1, h2 = _bloom_hashes()
    word_mask = w.select(
        F.col(id_col), F.explode(F.array(h1, h2)).alias("__p")
    ).select(
        id_col,
        F.shiftright(F.col("__p"), 6).cast("int").alias("__wd"),
        F.expr("shiftleft(1L, int(__p % 64))").alias("__mk"),
    )
    return (
        word_mask.groupBy(id_col, "__wd")
        .agg(F.expr("bit_or(__mk)").alias("__mk"))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__wd", "__mk"))
            ).alias("__bm")
        )
        .select(
            id_col,
            # dense 64-long array: the hot-path probe is an O(1)
            # codegen element_at, never an interpreted map scan
            F.transform(
                F.sequence(F.lit(0), F.lit(_BLOOM_BITS // 64 - 1)),
                lambda i: F.coalesce(
                    F.element_at("__bm", i.cast("int")),
                    F.lit(0).cast("long"),
                ),
            ).alias("__bl"),
        )
    )


def sparse_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_pct: int = 10,
    threshold: float = 0.6,
    scale: int = 1_000_000,
    weights_df: DataFrame | None = None,
    indexed_df: DataFrame | None = None,
    blooms_df: DataFrame | None = None,
) -> DataFrame:
    """DF-pruned inverted-index cosine similarity join — the classic
    MapReduce sparse-vector similarity pattern (Elsayed/Lin/Oard 2008
    pairwise-document-similarity; the lexical complement of the dense
    embedding ANN family in this module).

    Every doc becomes a sparse term-weight vector; candidate pairs come
    from joining the INVERTED INDEX to itself on the term key, so two
    docs meet only through terms they share. The scale lever is the
    document-frequency prune: terms present in more than ``max_df_pct``%
    of the corpus are dropped BEFORE the self-join (an integer compare,
    ``df * 100 <= n_docs * max_df_pct``), which (a) bounds per-term join
    fan-out at (max_df)² and kills the boilerplate-term quadratic
    blow-up, and (b) removes exactly the terms that carry no similarity
    signal — the IDF intuition applied as a hard gate.

    Exactness across engines: weights are INTEGERS — w = tf · (scale DIV
    df), floor division — so dot products and norms are exact DECIMAL(38,0)
    sums immune to float summation order (the failure mode semdedup_pairs
    documents). The only float ops are the final correctly-rounded
    cast/sqrt/divide of exact integers, identical in any IEEE engine;
    cos_sim is rounded to 6 decimals on both sides and the threshold is
    applied to the ROUNDED value.

    CANDIDATE GENERATION is prefix-filtered (round 10 — the AllPairs
    bound of Bayardo/Ma/Srikant WWW'07, the weighted-cosine complement
    of ppjoin's Jaccard prefix): each doc's features sort rarest-first
    (posting count asc), and a feature stays in the CANDIDATE PREFIX
    only while the suffix strictly after it could still reach the
    threshold — Σ_{t∈suffix} ŵ(d,t)·maxŵ(t) ≥ τ′, where ŵ is the
    L2-normalized weight and maxŵ(t) the term's corpus-wide max. Any
    pair with cos ≥ τ must share a feature inside the smaller-id doc's
    prefix (if every shared term sat in its suffix, dot ≤ the suffix
    bound < τ), so joining prefix(a) × full postings(b) keeps 100%
    recall while the frequent near-stopword terms — exactly the ones
    with quadratic posting fan-out — never generate candidates. The
    bound runs in floats with τ′ = τ − 1e−6 − 1e−9 slack (covers the
    6-dp output rounding and float error, so a borderline true pair
    can never be pruned); the VERIFY stage recomputes the exact
    integer dot over the candidates only. Pre-r10 this was a raw
    posting self-join: correct, but on a realistic Zipf vocabulary the
    terms just under the df cap each contributed |postings|² pairs
    (the zipf_sf1 audit measured it in the tens of minutes; the
    filtered form is seconds).

    Shuffles: (doc,term) tf groupBy → term-keyed df groupBy (vocab
    cardinality) → term-keyed maxŵ groupBy → doc-keyed prefix window →
    term-keyed prefix×postings candidate join → pair-keyed verify —
    only (id, term, integer weight) tuples ever shuffle.

    Output: (id_a, id_b, n_shared_terms, cos_sim) for rounded
    cos_sim ≥ threshold, id_a < id_b.
    """
    dec = "decimal(38,0)"
    # --- AllPairs/L2AP prefix filter (candidate generation) ---
    # Feature i is DROPPED only when the whole tail from i onward is
    # jointly below τ′ — keep iff bound_i ≥ τ′ with bound_i INCLUSIVE
    # of i's own contribution (the dropped set is then a tail whose
    # total bound is < τ′; testing the sum strictly after i instead
    # drops one feature too many and loses borderline true pairs —
    # caught by the zipf_sf0.01 oracle). TWO independent tail bounds,
    # both valid, combined by min:
    #  * __s = Σ ŵ·maxŵ (AllPairs) — dot over the tail term-by-term;
    #  * __g = ‖tail‖₂  (L2AP b-bound, Anastasiu/Karypis ICDE'14) —
    #    dot over the tail ≤ ‖tail(a)‖·‖b‖ = ‖tail(a)‖, b unit.
    # The L2 bound is what makes idf²-weighted vectors prune: their
    # squared mass concentrates in the rare head, so the tail norm
    # collapses after a handful of features, while a single short doc
    # spiking maxŵ(t) keeps the AllPairs bound loose across every
    # mid-frequency term (measured: maxŵ alone left zipf_sf1
    # candidate generation effectively quadratic — 58 CPU-min,
    # killed; with the min-bound the whole query is seconds).
    tau = threshold - 1e-6 - 1e-9  # rounding + float slack: conservative
    if indexed_df is not None:
        # staged path: every leg below is a plain columnar scan
        indexed = verify_src = indexed_df
    else:
        w = (
            weights_df
            if weights_df is not None
            else sparse_cosine_weights(
                df, id_col, text_col, max_df_pct=max_df_pct, scale=scale
            )
        )
        indexed = sparse_cosine_index(w, id_col)
        # verify/norm legs need only (id, term, w) — deriving them
        # from `indexed` would re-execute the norm-join + term-stats +
        # window lineage three more times on the unstaged path
        # (review r10 #3); the plain weight frame already carries them
        verify_src = w
    keep = F.least(F.col("__s"), F.col("__g")) >= tau
    prefix = indexed.filter(keep).select(
        F.col(id_col).alias("id_a"),
        "term",
        F.col("__g").alias("__ga"),
    )
    # PREFIX × PREFIX join (round 11 — the full two-sided AllPairs
    # bound; pre-r11 the probe side was the FULL posting list). Sound
    # because the rarest shared term t* of any qualifying pair must
    # lie in BOTH prefixes: every shared term sits at-or-after t* in
    # the global rarest-first order, so dot ≤ min(__s_x(t*), __g_x(t*))
    # for EITHER endpoint x — if t* fell in either suffix, that
    # endpoint's inclusive tail bound is < τ′ and the pair cannot
    # reach τ. Probe side shrinks from |postings| to |prefix| rows
    # (3.8M → 272k at zipf_sf1) and candidates fall with it.
    probe = indexed.filter(keep).select(
        F.col(id_col).alias("id_b"),
        "term",
        F.col("__g").alias("__gb"),
    )
    # candidate-ROW gate (L2AP's Cauchy-Schwarz step): every shared
    # term of a qualifying pair has global order ≥ the smallest shared
    # term t*, so dot ≤ ‖tail_a(t*)‖·‖tail_b(t*)‖ — and the join row
    # AT t* carries exactly those tail norms, so filtering rows by
    # __ga·__gb ≥ τ′ can never drop a true pair (the t* row survives;
    # other rows for the same pair may die, distinct() needs only one)
    cands = (
        prefix.join(probe, "term")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("__ga") * F.col("__gb") >= tau)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # --- exact integer verify over candidates only ---
    # (A map-lookup formulation — per-doc term→w maps + a higher-order
    # aggregate dot — was measured in round 11 and REJECTED: Spark's
    # higher-order functions are interpreted and its map lookup is a
    # linear scan, so the dot cost O(|terms|²) per pair; the posting
    # join below stays inside whole-stage codegen.)
    wa = verify_src.select(
        F.col(id_col).alias("id_a"), "term", F.col("w").alias("__wa")
    )
    wb = verify_src.select(
        F.col(id_col).alias("id_b"), "term", F.col("w").alias("__wb")
    )
    # BLOOM-PRUNED explosion (round 11): verifying pair (a,b) needs
    # only the terms a AND b SHARE (~30 at zipf_sf1), but the exact
    # join must explode every candidate × |terms(a)| row (155 avg —
    # 103.5M rows at zipf_sf1) through the (id_b, term) shuffle, where
    # ~80% die on the other side. Give every doc a 4096-bit / 2-hash
    # Bloom set of its terms (see sparse_cosine_blooms — stageable
    # alongside the index); candidates carry b's set, and each exploded
    # a-row is filtered by two integer bit probes BEFORE the shuffle.
    # Bloom membership has NO false negatives, so every shared term
    # survives and the result is bit-identical; false positives just
    # ride into the exact join. Everything on the 103M-row path is
    # codegen (xxhash64, element_at, shiftright, bitwiseAND). Spark's
    # runtime bloom join cannot fire here: the creation side exceeds
    # its 10 MB threshold and it prunes scans, not mid-plan
    # intermediates.
    blooms = (
        blooms_df
        if blooms_df is not None
        else sparse_cosine_blooms(verify_src, id_col)
    ).select(F.col(id_col).alias("id_b"), "__bl")
    h1, h2 = _bloom_hashes()

    # 64 single-bit masks as a literal array: the probe is then two
    # codegen element_at lookups + one AND (the pyspark shiftright
    # wrapper only takes literal amounts; element_at sidesteps it)
    _MASKS = F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(64)
        ]
    )

    def _hit(h):
        word = F.element_at(
            "__bl", (F.shiftright(h, 6) + F.lit(1)).cast("int")
        )
        mask = F.element_at(_MASKS, ((h % 64) + 1).cast("int"))
        return word.bitwiseAND(mask) != 0

    pairs = (
        cands.join(blooms, "id_b")
        .join(wa, "id_a")
        .filter(_hit(h1) & _hit(h2))
        .drop("__bl")
        .join(wb, ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.col("__wa").cast(dec) * F.col("__wb").cast(dec)
            ).alias("__dot"),
            F.count("*").alias("n_shared_terms"),
        )
    )
    norms = verify_src.groupBy(id_col).agg(
        F.sum((F.col("w").cast(dec) * F.col("w").cast(dec))).alias("norm2")
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("norm2").alias("__na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("norm2").alias("__nb"))
    cos = F.round(
        F.col("__dot").cast("double")
        / F.sqrt(F.col("__na").cast("double") * F.col("__nb").cast("double")),
        6,
    )
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "n_shared_terms", "cos_sim")
    )


def sparse_cosine_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_df_pct: int = 10,
    threshold: float = 0.6,
    scale: int = 1_000_000,
    weights_df: DataFrame | None = None,
    indexed_df: DataFrame | None = None,
    blooms_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document k-NN by sparse cosine — the BOUNDED-OUTPUT form of
    :func:`sparse_cosine_pairs` (round 11, VERDICT r10 item 5): most
    retrieval/dedup users want each document's k nearest neighbors,
    not the full ≥τ pair set (12.5M rows at sf1 — on a near-duplicate-
    heavy corpus the all-pairs OUTPUT is itself the scale hazard).
    Candidate generation, prefix filter and exact integer verify are
    sparse_cosine_pairs' own — the staged threshold-independent index
    is reused verbatim — and the cut is one per-doc window over the
    SYMMETRIZED pair set (each undirected pair serves both endpoints)
    with a deterministic (cos desc, neighbor asc) order, so output is
    ≤ N·k rows however dense the similarity graph gets. The τ floor
    stays: it is what keeps candidate GENERATION sub-quadratic (a
    thresholdless exact k-NN cannot prefix-prune; use the IVF/LSH
    family for that regime)."""
    pairs = sparse_cosine_pairs(
        df,
        id_col,
        text_col,
        max_df_pct=max_df_pct,
        threshold=threshold,
        scale=scale,
        weights_df=weights_df,
        indexed_df=indexed_df,
        blooms_df=blooms_df,
    )
    sym = pairs.select(
        F.col("id_a").alias(id_col),
        F.col("id_b").alias("neighbor_id"),
        "cos_sim",
    ).unionByName(
        pairs.select(
            F.col("id_b").alias(id_col),
            F.col("id_a").alias("neighbor_id"),
            "cos_sim",
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            id_col,
            "neighbor_id",
            F.col("rk").cast("long").alias("rk"),
            "cos_sim",
        )
    )


def contrastive_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_neg: int = 2,
    max_anchor_id: int = 20,
    bucket_dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41),
) -> DataFrame:
    """Contrastive training-pair mining — the data-prep step behind
    embedding-model fine-tuning (SimCSE/SBERT-style): for each anchor, its
    nearest SAME-label vector as the positive and its ``n_neg`` nearest
    DIFFERENT-label vectors *from the same sign-LSH bucket* as hard
    negatives. The bucket restriction is the point: random negatives are
    trivially far (no gradient signal); same-bucket ones are the
    geometrically-confusable impostors a contrastive loss learns from —
    and it is also the scale lever, because the negative search joins
    bucket-to-bucket instead of all-pairs.

    Output: (anchor_id, pair_id, kind 'pos'|'neg', cos_sim, rk).
    Scale: anchors broadcast; positive join blocks on label, negative join
    on (bucket, ≠label); per-anchor windows rank candidates. Deterministic:
    cosine ties broken by id."""
    base = emb.select(
        F.col(id_col),
        F.col(label_col).alias("__lbl"),
        as_double_vec(F.col(vec_col)).alias("__v"),
        sign_lsh_bucket(F.col(vec_col), dims=bucket_dims).alias("__b"),
    )
    anchors = base.filter(F.col(id_col) < max_anchor_id).select(
        F.col(id_col).alias("anchor_id"),
        F.col("__lbl").alias("__albl"),
        F.col("__v").alias("__av"),
        F.col("__b").alias("__ab"),
    )
    sim = cosine(F.col("__v"), F.col("__av"))
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    pos = (
        base.join(
            F.broadcast(anchors),
            (F.col("__lbl") == F.col("__albl"))
            & (F.col(id_col) != F.col("anchor_id")),
        )
        .withColumn("cos_sim", sim)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 1)
        .select(
            "anchor_id",
            F.col(id_col).alias("pair_id"),
            F.lit("pos").alias("kind"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rk",
        )
    )
    neg = (
        base.join(
            F.broadcast(anchors),
            (F.col("__b") == F.col("__ab"))
            & (F.col("__lbl") != F.col("__albl")),
        )
        .withColumn("cos_sim", sim)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= n_neg)
        .select(
            "anchor_id",
            F.col(id_col).alias("pair_id"),
            F.lit("neg").alias("kind"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rk",
        )
    )
    return pos.unionByName(neg)
