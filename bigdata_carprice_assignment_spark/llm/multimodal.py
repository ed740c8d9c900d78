"""Multimodal-column plumbing (driver north star).

Policy: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` operators so payload bytes never
round-trip through Python row-at-a-time.

The container has no codec libraries, so the decode kernels are STUBS:
``decode='fake'`` produces deterministic pseudo-features from the bytes
(so the distributed plumbing — schema, batching, partitioning — is fully
exercised and tested); ``decode='real'`` raises NotImplementedError at
the exact point a Pillow/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, "
    "feat array<double>, decode_ok boolean"
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat a text corpus as binary media (UTF-8 payload) so the
    multimodal path has real bytes to run on in this container.

    Repartitions by id first: media kernels are per-row CPU work and the
    corpus may arrive as one file split — spread before the Python stage.
    """
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    df = df.repartition(n_parts, id_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic pseudo-embedding from payload bytes (sha256-seeded) —
    stands in for a real decode+CNN feature kernel."""
    digest = hashlib.sha256(payload).digest()
    return [int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(df: DataFrame, decode: str = "fake", dim: int = 8) -> DataFrame:
    """Decode + feature-extract as mapInPandas: Arrow batches in, Arrow
    batches out; executor-parallel, no driver involvement.

    Kernel shape: ``n_bytes`` is computed NATIVELY (``F.length`` before
    the Python stage — byte counting needs no decode), and the Python
    stage hashes each payload ONCE, deriving both the hex digest and the
    pseudo-features from the same digest buffer via a list comprehension
    (no per-column ``Series.map`` re-hash)."""
    if decode == "real":  # pragma: no cover - no codecs in this container
        raise NotImplementedError(
            "real decode requires Pillow/ffmpeg (not in this image); "
            "use decode='fake' for the deterministic stub"
        )
    if decode != "fake":
        raise ValueError(f"unknown decode mode: {decode}")

    with_len = df.withColumn("_n_bytes", F.coalesce(F.length("payload"), F.lit(0)))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.sha256(b if b is not None else b"").digest()
                for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["_n_bytes"],
                    "sha256": [d.hex() for d in digests],
                    "feat": [
                        [
                            int.from_bytes(d[4 * i : 4 * i + 4], "big") / 2**32
                            for i in range(dim)
                        ]
                        for d in digests
                    ],
                    "decode_ok": pdf["payload"].notna(),
                }
            )

    return with_len.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, decode: str = "fake") -> DataFrame:
    """Image resize kernel slot. Fake mode passes payloads through with
    updated metadata (proves the schema/batch contract); real mode is the
    Pillow call site."""
    if decode == "real":  # pragma: no cover
        raise NotImplementedError("real resize requires Pillow (not in this image)")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "payload"]].copy()
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(
        op, schema="media_id long, payload binary, width int, height int"
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, decode: str = "fake"
) -> DataFrame:
    """Video frame-sampling kernel slot: one output row per sampled frame
    (explode shape). Fake mode derives frame count from metadata duration
    (or payload size) deterministically."""
    if decode == "real":  # pragma: no cover
        raise NotImplementedError("real frame sampling requires ffmpeg")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = [b if b is not None else b"" for b in pdf["payload"]]
            n_frames = np.minimum(
                np.maximum(
                    np.fromiter((len(b) for b in payloads), dtype=np.int64) // 64, 1
                ),
                16,
            )
            # vectorized explode: repeat ids, concatenated per-media aranges
            media_id = np.repeat(pdf["media_id"].to_numpy(), n_frames)
            frame_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in n_frames])
            shas = [
                hashlib.sha256(b + int(i).to_bytes(4, "big")).hexdigest()
                for b, n in zip(payloads, n_frames)
                for i in range(n)
            ]
            yield pd.DataFrame(
                {
                    "media_id": media_id,
                    "frame_idx": frame_idx,
                    "ts_ms": frame_idx.astype(np.int64) * every_ms,
                    "frame_sha": shas,
                }
            )

    return df.mapInPandas(
        op, schema="media_id long, frame_idx int, ts_ms long, frame_sha string"
    )
