"""Multimodal column plumbing (SURVEY.md §2.12 E4).

Images/audio/video are opaque ``binary`` payloads + a typed metadata struct.
The Spark-side machinery — schema, partition-sized Arrow batches through
``mapInPandas``, deterministic feature extraction — is real and tested; the
actual codec decode is STUBBED (this container has no image/audio libraries):
``decode_stub=True`` computes deterministic byte-level features, and
``decode_stub=False`` raises ``NotImplementedError`` where a real
PIL/torchaudio call would go.

Scale notes: ``mapInPandas`` streams Arrow record batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) so payload bytes never
accumulate on any single heap; binary columns should be stored in their own
parquet column chunk (columnar pruning keeps metadata-only queries from
touching payloads at all).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("source_uri", StringType()),
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("first_byte", LongType()),
    ]
)


def attach_media_column(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "image"
) -> DataFrame:
    """Build a media-shaped frame from any table by treating a text column's
    UTF-8 bytes as the payload — the deterministic fake used in tests and
    the driver's oracle checks (no media files exist in the environment)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("synthetic://"), F.col(id_col).cast("string")).alias(
                "source_uri"
            ),
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media_df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the real distributed plumbing a decoder plugs into.

    With ``decode_stub`` the "features" are deterministic byte-level stats
    (length, md5, first byte); without it, the codec hook raises
    ``NotImplementedError`` (no media libs in this environment).
    """

    def _extract(batches):
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real codec decode requires PIL/torchaudio — not available; "
                    "use decode_stub=True"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if b else None
                    ).astype("Int64"),
                }
            )

    return media_df.mapInPandas(_extract, FEATURE_SCHEMA)


def resize_payload(
    media_df: DataFrame, target_bytes: int = 4096, decode_stub: bool = True
) -> DataFrame:
    """Resize hook: binary payload in → binary payload out, meta updated —
    the image-resize / audio-resample shape. The distributed plumbing
    (Arrow batches both directions, MEDIA_SCHEMA preserved, meta.n_bytes
    rewritten) is real; the transform is STUBBED as deterministic
    truncate-or-cycle-pad to ``target_bytes`` (a real deployment swaps the
    stub for ``PIL.Image.resize`` / ``torchaudio.resample`` inside the
    same generator). ``decode_stub=False`` raises ``NotImplementedError``
    at the codec boundary.
    """

    def _resize(batches):
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real codec resize requires PIL/torchaudio — not "
                    "available; use decode_stub=True"
                )

            def fix(b):
                if b is None or len(b) == 0:
                    return b
                if len(b) >= target_bytes:
                    return bytes(b[:target_bytes])
                reps = (target_bytes + len(b) - 1) // len(b)
                return bytes((bytes(b) * reps)[:target_bytes])

            payloads = pdf["payload"].map(fix)
            meta = pd.DataFrame(
                {
                    "source_uri": [m["source_uri"] for m in pdf["meta"]],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ),
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "meta": meta.to_dict("records"),
                }
            )

    return media_df.mapInPandas(_resize, MEDIA_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' over the opaque payload: emit one row per sampled
    offset (the video-frame-extraction shape, minus the codec). Pure
    expression-level fan-out — shows how per-frame rows explode from a
    payload without a UDF."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return media_df.select(
        "media_id",
        F.explode(offsets).alias("offset"),
    ).filter(F.col("offset") < n)
