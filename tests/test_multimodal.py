"""Multimodal plumbing: decode, resize, frame sampling, feature
extraction, and the composition into the ANN operators."""

from pyspark.sql import functions as F

from search_rs_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_metadata,
    extract_features,
    fake_assets,
    frame_sample_plan,
    pack_header,
    resize_assets,
)


def test_decode_metadata_shapes(spark):
    meta = decode_metadata(fake_assets(spark, 60)).collect()
    assert len(meta) == 60
    assert all(r["valid"] for r in meta)
    kinds = {r["kind"] for r in meta}
    assert kinds == {"image", "audio", "video"}
    for r in meta:
        assert 16 <= r["width"] <= 79 and 16 <= r["height"] <= 79
        assert r["payload_bytes"] == 16 + r["width"] * r["height"]
        if r["kind"] == "image":
            assert r["n_frames"] == 1


def test_decode_invalid_payload(spark):
    import datetime

    rows = [(0, "image", None), (1, "image", b"short"), (2, "image", b"XXXX" + b"\0" * 20)]
    d = spark.createDataFrame(rows, "asset_id long, kind string, payload binary")
    meta = {r["asset_id"]: r for r in decode_metadata(d).collect()}
    assert not any(meta[i]["valid"] for i in range(3))


def test_resize_bounds_and_aspect(spark):
    assets = fake_assets(spark, 60)
    before = {r["asset_id"]: r for r in decode_metadata(assets).collect()}
    after = {r["asset_id"]: r for r in decode_metadata(resize_assets(assets, 32)).collect()}
    assert set(before) == set(after)
    for aid, b in before.items():
        a = after[aid]
        assert a["valid"]
        assert max(a["width"], a["height"]) <= 32
        if max(b["width"], b["height"]) <= 32:  # untouched
            assert (a["width"], a["height"]) == (b["width"], b["height"])
        else:  # exact scale contract: floor(dim * 32/max_dim), min 1
            assert a["n_frames"] == b["n_frames"]
            scale = 32 / max(b["width"], b["height"])
            assert a["width"] == max(1, int(b["width"] * scale))
            assert a["height"] == max(1, int(b["height"] * scale))
        # truncation budget is PER-FRAME (nw*nh*nf), clamped to the
        # bytes the original payload actually carried
        budget = a["width"] * a["height"] * a["n_frames"]
        orig_body = b["payload_bytes"] - 16
        assert a["payload_bytes"] == 16 + min(budget, orig_body)


def test_frame_sample_plan(spark):
    assets = fake_assets(spark, 60)
    meta = {
        r["asset_id"]: r["n_frames"]
        for r in decode_metadata(assets).filter(F.col("kind") == "video").collect()
    }
    plan: dict[int, list[int]] = {}
    for r in frame_sample_plan(assets, every_n=5).collect():
        plan.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert set(plan) == set(meta)
    for aid, frames in plan.items():
        assert sorted(frames) == list(range(0, meta[aid], 5))


def test_features_deterministic_and_feed_ann(spark):
    assets = fake_assets(spark, 60)
    f1 = {r["asset_id"]: r["embedding"] for r in extract_features(assets).collect()}
    f2 = {r["asset_id"]: r["embedding"] for r in extract_features(assets).collect()}
    assert f1 == f2
    assert all(len(v) == FEATURE_DIM for v in f1.values())
    assert all(any(abs(x) > 1e-6 for x in v) for v in f1.values())

    # composition: asset features are a drop-in embeddings table for the
    # ANN operators (vec_id <- asset_id)
    from search_rs_spark.operators.similarity import cosine_topk_bruteforce

    emb = extract_features(assets).select(
        F.col("asset_id").alias("vec_id"), F.col("kind").alias("label"), "embedding"
    )
    top = cosine_topk_bruteforce(emb, f1[0], k=5, exclude_vec_id=0).collect()
    assert len(top) == 5
    assert all(-1.0 <= r["cos"] <= 1.0 for r in top)


def test_features_null_for_invalid(spark):
    d = spark.createDataFrame(
        [(0, "image", b"bogus"), (1, "image", pack_header(4, 4, 1) + b"\1" * 16)],
        "asset_id long, kind string, payload binary",
    )
    out = {r["asset_id"]: r["embedding"] for r in extract_features(d).collect()}
    assert out[0] is None and out[1] is not None


def test_resize_multiframe_full_payload_keeps_every_frame(spark):
    """A video payload carrying its FULL w*h*nf body must resize to the
    unclamped per-frame budget nw*nh*nf — not just whatever bytes the
    source happened to hold. fake_assets only ever emits w*h body bytes,
    so this is the one path its corpus never exercises (round-3 ADVICE):
    a crafted full-length 3-frame payload pins it."""
    from search_rs_spark.operators.multimodal import resize_assets

    w, h, nf = 64, 48, 3
    body = bytes((i * 7 + 3) % 251 for i in range(w * h * nf))
    d = spark.createDataFrame(
        [(0, "video", pack_header(w, h, nf) + body)],
        "asset_id long, kind string, payload binary",
    )
    out = resize_assets(d, max_side=32).collect()[0]["payload"]
    raw = bytes(out)
    import struct as _s

    nw, nh, got_nf = _s.unpack("<III", raw[4:16])
    # aspect preserved, floor, scale = 32/64
    assert (nw, nh, got_nf) == (32, 24, nf)
    # UNCLAMPED per-frame budget: all nf frames' worth of bytes kept
    assert len(raw) - 16 == nw * nh * nf
    # and the kept bytes are the source prefix (stub truncation contract)
    assert raw[16:] == body[: nw * nh * nf]


def test_format_number_half_up_matches_spark(spark):
    """The mm_features oracle formats its literal embeddings with
    _format_number_half_up, which claims format_number(x, 6) semantics
    (java DecimalFormat, HALF_UP on the exact decimal expansion of the
    double). Pin the claim on adversarial values: near-halfway points,
    carries across the integer boundary, signed near-zeros — through a
    FLOAT column, the dtype the embedding actually has."""
    from pyspark.sql import functions as F

    from search_rs_spark.operators.multimodal import _format_number_half_up

    vals = [
        0.1234565, -0.1234565, 0.1234555, -0.1234555,
        0.9999995, -0.9999995, 0.99999949, -0.99999949,
        5e-7, -5e-7, 4.9e-7, -4.9e-7, 0.0, 1.0, -1.0,
        0.5, -0.5, 0.0000015, -0.0000015,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x float")
    got = [
        r["s"]
        for r in df.select(F.format_number("x", 6).alias("s")).collect()
    ]
    import numpy as np

    want = [_format_number_half_up(np.float32(v)) for v in vals]
    assert got == want, list(zip(vals, got, want))
