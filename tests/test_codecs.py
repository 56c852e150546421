"""Bit-codec tests: golden vectors from the reference plus roundtrips.

Golden bit patterns come from
/root/reference/search/src/disk/bits_writer.rs:103-128 and the
read/write roundtrip mirrors bits_reader.rs:130-186.
"""

import random

import numpy as np

from search_rs_spark.functions.codecs import (
    BitReader,
    BitWriter,
    decode_postings,
    encode_postings,
    gamma_bit_lengths,
    int_to_gamma,
    int_to_vbyte,
    vbyte_bit_lengths,
)


def test_gamma_golden():
    g, l = int_to_gamma(1)
    assert format(g, "b") == "1" and l == 1
    g, l = int_to_gamma(7)
    assert format(g, "b") == "11100" and l == 5


def test_vbyte_golden():
    vb, l = int_to_vbyte(1024)
    assert format(vb, "b") == "1000100000000000" and l == 16
    vb, l = int_to_vbyte(1)
    assert format(vb, "b") == "10000001" and l == 8


def test_roundtrip_like_reference():
    # mirrors bits_reader.rs test_read
    w = BitWriter()
    for i in range(1, 100):
        w.write_vbyte(i)
    for i in range(1, 100):
        w.write_gamma(i)
    w.write_gamma_gap_vector([1, 3, 6])
    w.write_str("hello")
    w.write_str("")
    blob = w.to_bytes(pad_to=16)
    assert len(blob) % 16 == 0

    r = BitReader(blob)
    for i in range(1, 100):
        assert r.read_vbyte() == i
    for i in range(1, 100):
        assert r.read_gamma() == i
    assert r.read_gamma_gap_vector() == [1, 3, 6]
    assert r.read_str() == "hello"
    assert r.read_str() == ""


def test_seek():
    w = BitWriter()
    offset = 0
    for i in range(1000):
        offset += w.write_gamma(i)
    w.write_gamma(10)
    r = BitReader(w.to_bytes(pad_to=16))
    r.seek(offset)
    assert r.read_gamma() == 10


def test_random_roundtrip():
    rng = random.Random(42)
    vals = [rng.randrange(0, 1 << 30) for _ in range(2000)]
    w = BitWriter()
    for v in vals:
        w.write_gamma(v)
        w.write_vbyte(v)
    r = BitReader(w.to_bytes())
    for v in vals:
        assert r.read_gamma() == v
        assert r.read_vbyte() == v


def test_postings_blob_roundtrip():
    rng = random.Random(7)
    doc_ids = sorted(rng.sample(range(100000), 50))
    tfs = [rng.randrange(1, 20) for _ in doc_ids]
    positions = [sorted(rng.sample(range(5000), tf)) for tf in tfs]
    blob = encode_postings(doc_ids, tfs, positions)
    d, t, p = decode_postings(blob)
    assert d == doc_ids and t == tfs and p == positions


def test_empty_postings_blob():
    blob = encode_postings([], [], [])
    assert decode_postings(blob) == ([], [], [])


def test_vectorised_bit_lengths():
    vals = np.array([0, 1, 6, 7, 127, 128, 1023, 1024, (1 << 28) - 2], dtype=np.int64)
    for v, gl, vl in zip(vals, gamma_bit_lengths(vals), vbyte_bit_lengths(vals)):
        assert gl == int_to_gamma(int(v) + 1)[1]
        assert vl == int_to_vbyte(int(v) + 1)[1]
