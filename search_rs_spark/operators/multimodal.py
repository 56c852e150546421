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


def resize_assets(assets: DataFrame, max_side: int = 32) -> DataFrame:
    """Arrow-batched resize: payloads whose decoded dims exceed
    ``max_side`` are rewritten with proportionally scaled dims (aspect
    preserved, floor, min 1). STUB pixel kernel — the body is truncated
    to the new ``w*h*n_frames`` budget instead of resampled (a real
    deployment swaps in PIL's ``Image.resize`` per frame with the same
    UDF signature and batch shape). Frame handling: the header's
    ``n_frames`` is preserved and the truncation budget is PER-FRAME
    (``nw*nh*nf``, clamped to the bytes actually present), so a
    multi-frame payload keeps data for every frame its header claims —
    the header/metadata contract stays re-decodable for a real
    ``w*h*nf`` decoder. Invalid payloads pass through unchanged."""

    def fn(it):
        import pandas as pd

        for pdf in it:
            out = {"asset_id": pdf["asset_id"], "kind": pdf["kind"], "payload": []}
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else None
                meta = _decode_stub(raw)
                if meta is None:
                    out["payload"].append(raw)
                    continue
                w, h, nf = meta
                if max(w, h) <= max_side:
                    out["payload"].append(raw)
                    continue
                scale = max_side / max(w, h)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                # STUB: truncate to the all-frames budget, not resample
                body = raw[16 : 16 + nw * nh * nf]
                out["payload"].append(pack_header(nw, nh, nf) + body)
            yield pd.DataFrame(out)

    return assets.mapInPandas(fn, schema=ASSET_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(asset_id, kind, embedding ARRAY<FLOAT>) — deterministic feature
    vectors from the payload bytes. STUB featurizer (blake2b of the
    payload expanded to ``dim`` floats in [-1, 1]; a real deployment
    swaps in a CLIP/audio encoder with the same signature), but the
    output column is contract-real: it feeds the similarity/IVF/LSH
    ANN operators directly (vec_id <- asset_id), which is the whole
    point of the plumbing. Invalid payloads get a null embedding."""

    def fn(it):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in it:
            embs = []
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else None
                if _decode_stub(raw) is None:
                    embs.append(None)
                    continue
                buf = b""
                j = 0
                while len(buf) < 4 * dim:
                    buf += hashlib.blake2b(raw + bytes([j]), digest_size=32).digest()
                    j += 1
                u = np.frombuffer(buf[: 4 * dim], dtype=np.uint32).astype(np.float64)
                embs.append((u / np.float64(2**31) - 1.0).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "kind": pdf["kind"], "embedding": embs}
            )

    return assets.mapInPandas(fn, schema=FEATURES_SCHEMA)


def features_signature(features: DataFrame) -> DataFrame:
    """(asset_id, kind, emb_sig) — harness-safe projection of
    :func:`extract_features`: the ``array<float>`` embedding encoded as
    one '|'-joined string of 6-decimal floats, because list-valued
    columns cannot be sorted/hashed by pandas-based canonicalizers
    (same pattern as dedup.minhash_signatures). Null embeddings stay
    null. The array-typed operator itself is unchanged — this is only
    the driver-correctness surface."""
    return features.select(
        "asset_id",
        "kind",
        F.when(
            F.col("embedding").isNotNull(),
            F.concat_ws(
                "|", F.transform("embedding", lambda x: F.format_number(x, 6))
            ),
        ).alias("emb_sig"),
    )


# --- DuckDB oracles (driver-side literal tables) ---------------------
#
# Everything fake_assets emits is a deterministic function of
# (seed, asset_id), so the expected output of each multimodal operator
# can be recomputed driver-side WITHOUT Spark and folded into the
# oracle SQL as a VALUES literal table — the same mechanism as the ANN
# hyperplane/centroid literals (similarity.py / ivf.py). What the hash
# gate then pins is the distributed dataflow itself: the mapInPandas
# generation, the 16-byte header pack, the Arrow binary round trip,
# the decode/resize/featurize kernels and their schemas — all of which
# must reproduce the directly-computed values bit-for-bit.


def _expected_assets(n: int, seed: int = 5):
    """(asset_id, kind, w, h, n_frames, body) per fake_assets' spec."""
    import hashlib

    kinds = ["image", "audio", "video"]
    out = []
    for i in range(n):
        kind = kinds[i % 3]
        h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest()
        w = 16 + h[0] % 64
        ht = 16 + h[1] % 64
        frames = 1 if kind == "image" else 1 + h[2] % 30
        body = (h * ((w * ht) // 8 + 1))[: w * ht]
        out.append((i, kind, w, ht, frames, body))
    return out


def _meta_values_sql(rows) -> str:
    """VALUES literal table in decode_metadata's schema; rows are
    (asset_id, kind, width, height, n_frames, payload_bytes)."""
    vals = ",\n".join(
        f"({i}, '{k}', {w}, {h}, {nf}, {pb})" for i, k, w, h, nf, pb in rows
    )
    return (
        "SELECT CAST(c0 AS BIGINT) AS asset_id, c1 AS kind, "
        "CAST(c2 AS INTEGER) AS width, CAST(c3 AS INTEGER) AS height, "
        "CAST(c4 AS INTEGER) AS n_frames, CAST(c5 AS BIGINT) AS payload_bytes, "
        "TRUE AS valid "
        f"FROM (VALUES\n{vals}\n) t(c0, c1, c2, c3, c4, c5)"
    )


def decode_metadata_oracle_sql(n: int = 500, seed: int = 5) -> str:
    """Oracle for decode_metadata(fake_assets(spark, n)): every payload
    is valid by construction and carries 16 header + w*h body bytes."""
    rows = [
        (i, k, w, h, nf, 16 + w * h)
        for i, k, w, h, nf, _ in _expected_assets(n, seed)
    ]
    return _meta_values_sql(rows)


def resize_metadata_oracle_sql(
    n: int = 500, seed: int = 5, max_side: int = 32
) -> str:
    """Oracle for decode_metadata(resize_assets(fake_assets(n), max_side)):
    mirrors resize_assets' scaling arithmetic — aspect-preserving floor
    scale (min 1), n_frames preserved, body truncated to the per-frame
    budget clamped by the bytes actually present (w*h)."""
    rows = []
    for i, k, w, h, nf, _ in _expected_assets(n, seed):
        if max(w, h) <= max_side:
            rows.append((i, k, w, h, nf, 16 + w * h))
            continue
        scale = max_side / max(w, h)
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        rows.append((i, k, nw, nh, nf, 16 + min(nw * nh * nf, w * h)))
    return _meta_values_sql(rows)


def _format_number_half_up(x: float, d: int = 6) -> str:
    """Replicates Spark's format_number(x, 6) (java.text.DecimalFormat,
    RoundingMode.HALF_UP on the exact decimal expansion of the double;
    no grouping separators appear for |x| < 1000)."""
    import decimal

    q = decimal.Decimal(1).scaleb(-d)
    return str(decimal.Decimal(float(x)).quantize(q, decimal.ROUND_HALF_UP))


def features_signature_oracle_sql(
    n: int = 500, seed: int = 5, dim: int = FEATURE_DIM
) -> str:
    """Oracle for features_signature(extract_features(fake_assets(n))):
    recomputes the blake2b featurizer directly over the reconstructed
    payload bytes and formats with HALF_UP decimals (format_number
    semantics; equality over the full driver corpus is pinned in
    tests/test_multimodal.py)."""
    import hashlib

    import numpy as np

    vals = []
    for i, k, w, h, nf, body in _expected_assets(n, seed):
        raw = pack_header(w, h, nf) + body
        buf = b""
        j = 0
        while len(buf) < 4 * dim:
            buf += hashlib.blake2b(raw + bytes([j]), digest_size=32).digest()
            j += 1
        u = np.frombuffer(buf[: 4 * dim], dtype=np.uint32).astype(np.float64)
        emb = (u / np.float64(2**31) - 1.0).astype(np.float32)
        sig = "|".join(_format_number_half_up(v) for v in emb)
        vals.append(f"({i}, '{k}', '{sig}')")
    body_sql = ",\n".join(vals)
    return (
        "SELECT CAST(c0 AS BIGINT) AS asset_id, c1 AS kind, c2 AS emb_sig "
        f"FROM (VALUES\n{body_sql}\n) t(c0, c1, c2)"
    )


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
