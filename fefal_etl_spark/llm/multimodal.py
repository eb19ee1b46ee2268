"""Multimodal column plumbing (SURVEY.md §2.12 E4).

Images/audio/video are opaque ``binary`` payloads + a typed metadata struct.
The Spark-side machinery — schema, partition-sized Arrow batches through
``mapInPandas``, deterministic feature extraction — is real and tested.

The codec boundary has two modes:

- ``decode_stub=True`` computes deterministic byte-level features without
  interpreting the payload (any media type);
- ``decode_stub=False`` REALLY decodes images through the dependency-free
  numpy PNG/BMP/PPM codecs in :mod:`fefal_etl_spark.llm.media_codecs` and
  emits pixel-level features (width/height/channels/pixel_sum). JPEG
  routes to an env-gated Pillow decoder (round 7) — real clusters have
  Pillow, this container raises a clear NotImplementedError; audio
  beyond WAV and video still raise (torchaudio-class codecs absent).

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

# decode_stub=False features: everything integer-typed so oracle hashes are
# exact (no float summarization of pixel data)
DECODED_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("pixel_sum", LongType()),
    ]
)

# audio decode features: one row per fixed-length frame, all-integer so the
# oracle's closed-form replay hashes exactly (energy = Σ s², peak = max|s|)
AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
        StructField("peak", LongType()),
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


def attach_synth_images(
    df: DataFrame, id_col: str, fmt: str = "bmp"
) -> DataFrame:
    """Media frame with REAL decodable image payloads, generated
    deterministically from the id: width = 2 + id % 7, height = 2 + id % 5,
    flat pixel k (row-major RGB) = (id*31 + k) % 256, encoded as BMP, PPM
    or PNG (``fmt="png"`` — the stdlib-zlib codec in media_codecs.py).

    The closed-form pixel pattern is what makes the decode path
    oracle-checkable: DuckDB reproduces the decoded statistics analytically
    (``multimodal_decode``) without ever seeing the binary. Encoding runs
    distributed in ``mapInPandas`` like any real ingest-side transcoder.
    """

    def _gen(batches):
        import pandas as pd

        from fefal_etl_spark.llm.media_codecs import (
            encode_bmp,
            encode_png,
            encode_ppm,
            synth_image_array,
        )

        enc = {"ppm": encode_ppm, "png": encode_png}.get(fmt, encode_bmp)
        mime = {
            "ppm": "image/x-portable-pixmap",
            "png": "image/png",
        }.get(fmt, "image/bmp")
        for pdf in batches:
            ids = pdf["media_id"]
            payloads = [
                enc(synth_image_array(i, 2 + i % 7, 2 + i % 5)) for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "image",
                    "payload": payloads,
                    "meta": [
                        {
                            "source_uri": f"synthetic://{i}",
                            "mime": mime,
                            "n_bytes": len(p),
                        }
                        for i, p in zip(ids, payloads)
                    ],
                }
            )

    base = df.select(F.col(id_col).cast("long").alias("media_id"))
    return base.mapInPandas(_gen, MEDIA_SCHEMA)


def attach_synth_audio(df: DataFrame, id_col: str, sample_rate: int = 16000) -> DataFrame:
    """Media frame with REAL decodable mono 16-bit PCM WAV payloads,
    generated deterministically from the id: n_samples = 64 + id % 97,
    sample k = ((id*37 + k*k) % 4096) - 2048.

    The integer closed form is what makes the audio decode path
    oracle-checkable — DuckDB replays per-frame energy/peak analytically
    (``audio_frame_energy``) without parsing a byte of RIFF. Encoding runs
    distributed in ``mapInPandas`` like a real ingest-side transcoder."""

    def _gen(batches):
        import pandas as pd

        from fefal_etl_spark.llm.media_codecs import encode_wav, synth_audio_array

        for pdf in batches:
            ids = pdf["media_id"]
            payloads = [
                encode_wav(synth_audio_array(i, 64 + i % 97), sample_rate)
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "audio",
                    "payload": payloads,
                    "meta": [
                        {
                            "source_uri": f"synthetic://{i}.wav",
                            "mime": "audio/wav",
                            "n_bytes": len(p),
                        }
                        for i, p in zip(ids, payloads)
                    ],
                }
            )

    base = df.select(F.col(id_col).cast("long").alias("media_id"))
    return base.mapInPandas(_gen, MEDIA_SCHEMA)


def audio_frame_features(media_df: DataFrame, frame_len: int = 32) -> DataFrame:
    """REAL audio decode → fixed-length frame features, the audio leg of the
    E4 boundary (V49). Each WAV payload is parsed by the numpy RIFF/PCM16
    codec, sliced into ``frame_len``-sample frames (last frame may be
    partial), and reduced to all-integer statistics: ``energy`` = Σ s²
    (the squared-magnitude frame energy every VAD/silence-trim gate starts
    from) and ``peak`` = max |s|.

    Scale: one ``mapInPandas`` pass, no shuffle — output is ~n_samples/
    frame_len rows per clip, so downstream silence filtering happens on a
    frame table orders of magnitude smaller than the waveform bytes. Frame
    math is numpy-vectorized per batch (cumsum-free reshape + pad)."""

    def _frames(batches):
        import numpy as np
        import pandas as pd

        from fefal_etl_spark.llm.media_codecs import decode_wav

        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_id", "n_samples", "energy", "peak")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = decode_wav(payload)
                n = len(samples)
                n_frames = (n + frame_len - 1) // frame_len
                padded = np.zeros(n_frames * frame_len, dtype=np.int64)
                padded[:n] = samples.astype(np.int64)
                grid = padded.reshape(n_frames, frame_len)
                out["media_id"].extend([mid] * n_frames)
                out["frame_id"].extend(range(n_frames))
                counts = np.full(n_frames, frame_len, dtype=np.int64)
                if n % frame_len:
                    counts[-1] = n % frame_len
                out["n_samples"].extend(counts)
                out["energy"].extend((grid * grid).sum(axis=1))
                out["peak"].extend(np.abs(grid).max(axis=1))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(_frames, AUDIO_FRAME_SCHEMA)


def extract_features(media_df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the distributed plumbing plus a real decoder.

    With ``decode_stub`` the "features" are deterministic byte-level stats
    (length, md5, first byte; schema ``FEATURE_SCHEMA``). Without it, each
    payload is decoded through the numpy BMP/PPM codecs and the output is
    pixel-level (``DECODED_FEATURE_SCHEMA``: width/height/channels/
    pixel_sum). Non-image formats raise ``ValueError`` from the codec —
    a real deployment adds PIL/torchaudio branches inside the same
    generator; the Arrow batching, schema handling, and partitioning are
    unchanged by that swap.
    """

    def _extract_stub(batches):
        import pandas as pd

        for pdf in batches:
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

    def _extract_decoded(batches):
        import pandas as pd

        from fefal_etl_spark.llm.media_codecs import decode_image

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(payload)
                rows.append(
                    (
                        mid,
                        arr.shape[1],
                        arr.shape[0],
                        arr.shape[2],
                        int(arr.sum(dtype="int64")),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "pixel_sum"]
            )

    if decode_stub:
        return media_df.mapInPandas(_extract_stub, FEATURE_SCHEMA)
    return media_df.mapInPandas(_extract_decoded, DECODED_FEATURE_SCHEMA)


def resize_payload(
    media_df: DataFrame,
    target_bytes: int = 4096,
    decode_stub: bool = True,
    target_px: tuple[int, int] = (4, 3),
) -> DataFrame:
    """Resize hook: binary payload in → binary payload out, meta updated —
    the image-resize / audio-resample shape. The distributed plumbing
    (Arrow batches both directions, MEDIA_SCHEMA preserved, meta.n_bytes
    rewritten) is identical in both modes.

    With ``decode_stub`` the transform is a deterministic
    truncate-or-cycle-pad to ``target_bytes`` (no payload interpretation).
    With ``decode_stub=False`` each payload is REALLY decoded (numpy
    BMP/PPM codecs), nearest-neighbor-resized to ``target_px`` = (width,
    height) with the exact integer mapping ``src = dst * src_dim //
    dst_dim``, and re-encoded in its original container — a PIL-based
    deployment swaps only the three codec calls inside the generator.
    """

    def _resize(batches):
        import pandas as pd

        if not decode_stub:
            from fefal_etl_spark.llm.media_codecs import (
                decode_image,
                encode_like,
                resize_nearest,
            )

            tw, th = target_px

        for pdf in batches:
            if not decode_stub:

                def fix(b):
                    if b is None or len(b) == 0:
                        return b
                    return encode_like(resize_nearest(decode_image(b), tw, th), b)

            else:

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
