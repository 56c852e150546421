"""Multimodal column plumbing (image/audio/video as opaque binary).

The container has no image/audio codecs, so the decode kernels are
deterministic STUBS (clearly marked) — but the Spark-side plumbing is
real and tested: binary columns + typed metadata structs, Arrow-batched
``mapInPandas`` with bounded batch sizes, and a partitioning scheme
(hash by asset id) that scales to binary payloads far larger than the
text corpus.

``fake_assets`` synthesizes binary payloads with a parseable 16-byte
header (magic, width, height, n_frames) so "decode" is honest about
shapes without real codecs; ``decode_metadata`` parses it vectorized.
A real deployment swaps `_decode_stub` for PIL/ffmpeg decode with the
same UDF signature and batch shape.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"SRSA"

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def pack_header(width: int, height: int, n_frames: int) -> bytes:
    return MAGIC + struct.pack("<III", width, height, n_frames)


def fake_assets(spark: SparkSession, n: int, seed: int = 5) -> DataFrame:
    """Deterministic binary assets: header + pseudo-payload."""

    def gen(it):
        import hashlib

        import pandas as pd

        kinds = ["image", "audio", "video"]
        for pdf in it:
            rows = {"asset_id": [], "kind": [], "payload": []}
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest()
                w = 16 + h[0] % 64
                ht = 16 + h[1] % 64
                frames = 1 if kind == "image" else 1 + h[2] % 30
                body = (h * ((w * ht) // 8 + 1))[: w * ht]
                rows["asset_id"].append(i)
                rows["kind"].append(kind)
                rows["payload"].append(pack_header(w, ht, frames) + body)
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=max(2, n // 5000 or 1)).mapInPandas(
        gen, schema=ASSET_SCHEMA
    )


def _decode_stub(payload: bytes):
    """STUB decode: parses the fake header. A real implementation would
    call PIL/ffmpeg here (NotImplementedError without codecs)."""
    if payload is None or len(payload) < 16 or payload[:4] != MAGIC:
        return None
    w, h, nf = struct.unpack("<III", payload[4:16])
    return w, h, nf


def decode_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads."""

    def fn(it):
        import pandas as pd

        for pdf in it:
            out = {
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "width": [],
                "height": [],
                "n_frames": [],
                "payload_bytes": [],
                "valid": [],
            }
            for p in pdf["payload"]:
                meta = _decode_stub(bytes(p) if p is not None else None)
                if meta is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_frames"].append(None)
                    out["valid"].append(False)
                else:
                    out["width"].append(meta[0])
                    out["height"].append(meta[1])
                    out["n_frames"].append(meta[2])
                    out["valid"].append(True)
                out["payload_bytes"].append(len(p) if p is not None else 0)
            yield pd.DataFrame(out)

    return assets.repartition(F.col("asset_id")).mapInPandas(fn, schema=META_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 5) -> DataFrame:
    """(asset_id, frame_idx) sampling plan for video assets — the
    explode that a real frame extractor would map over."""
    meta = decode_metadata(assets).filter(F.col("valid") & (F.col("kind") == "video"))
    return meta.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
