"""Byte-identity of the export writer against the reference's writers.

A pure-Python replica of the reference's BitsWriter (u128 buffer,
little-endian 16-byte flush blocks — bits_writer.rs:8-100) and of the
three file writers (postings.rs:41-79, vocabulary.rs:16-42,
documents.rs:42-60) serves as the byte oracle: it follows the Rust
code's write order literally, including the §1.4 quirk where the df
block is written from the UNFILTERED postings vec in first-occurrence
order. The Spark export (plans/export.py) must byte-match it on
postings/offsets/docs, and on alphas up to the documented df-order
divergence — asserted exactly.
"""

import pytest

from search_rs_spark.functions.tokenizer import tokenize_and_stem
from search_rs_spark.plans.build import build_index
from search_rs_spark.plans.export import export_reference_index, load_reference_index
from search_rs_spark.plans.index import SearchIndex
from search_rs_spark.sources.webtext import (
    WEBTEXT_SCHEMA,
    _EPOCH,
    reference_fixture,
    wrap_html,
)

_U128 = (1 << 128) - 1


class RefBitsWriter:
    """Literal replica of bits_writer.rs:8-100 (test oracle only)."""

    def __init__(self):
        self.out = bytearray()
        self.buffer = 0
        self.written = 0

    def _update(self):
        self.out += self.buffer.to_bytes(16, "little")
        self.buffer = 0
        self.written = 0

    def _write_internal(self, payload, length):
        free = 128 - self.written
        self.buffer = (self.buffer | (payload << self.written)) & _U128
        if free > length:
            self.written += length
        else:
            self._update()
            if length > free:
                self.buffer = (self.buffer | (payload >> free)) & _U128
                self.written = length - free
        return length

    def write_gamma(self, n):  # biased: encodes n+1
        x = n + 1
        msb = x.bit_length() - 1
        unary = 1 << msb
        gamma = ((x ^ unary) << (msb + 1)) | unary
        return self._write_internal(gamma, 2 * msb + 1)

    def write_vbyte(self, n):  # biased: encodes n+1
        x = n + 1
        vb = 0
        byte_num = 0
        while x > 0:
            vb |= (x & 0x7F) << (8 * byte_num)
            x >>= 7
            byte_num += 1
        vb |= 1 << (8 * byte_num - 1)
        return self._write_internal(vb, 8 * byte_num)

    def write_str(self, s):
        n = self.write_gamma(len(s.encode()))
        for b in s.encode():
            n += self._write_internal(b, 8)
        return n

    def flush(self):
        if self.written != 0:
            self._update()
        self._update()
        return bytes(self.out)


def build_model(corpus):
    """builder.rs:44-130 in-memory model from [(path, text)]: postings
    in first-occurrence order, term_index_map in sorted-term order."""
    postings = []  # idx -> [(doc_id, tf, [positions])]
    term_to_idx = {}
    documents = []
    for doc_id, (path, text) in enumerate(sorted(corpus)):
        tokens = tokenize_and_stem(text)
        documents.append((path, len(tokens)))
        per_doc = {}
        for pos, t in enumerate(tokens):
            if t not in term_to_idx:
                term_to_idx[t] = len(postings)
                postings.append([])
            idx = term_to_idx[t]
            if doc_id not in per_doc.get(t, {}):
                per_doc.setdefault(t, {})[doc_id] = len(postings[idx])
                postings[idx].append([doc_id, 0, []])
            entry = postings[idx][per_doc[t][doc_id]]
            entry[1] += 1
            entry[2].append(pos)
    term_index_map = {t: term_to_idx[t] for t in sorted(term_to_idx)}
    return {
        "term_index_map": term_index_map,
        "postings": postings,
        "documents": documents,
    }


def ref_write_postings(model):
    pw, ow = RefBitsWriter(), RefBitsWriter()
    offset = 0
    prev_offset = 0
    ow.write_vbyte(len(model["term_index_map"]))
    for idx in model["term_index_map"].values():
        ow.write_gamma(offset - prev_offset)
        prev_offset = offset
        plist = model["postings"][idx]
        offset += pw.write_vbyte(len(plist))
        prev_doc = 0
        for doc_id, tf, positions in plist:
            offset += pw.write_gamma(doc_id - prev_doc)
            offset += pw.write_gamma(tf)
            prev_pos = 0
            offset += pw.write_vbyte(len(positions))
            for p in positions:
                offset += pw.write_gamma(p - prev_pos)
                prev_pos = p
            prev_doc = doc_id
    return pw.flush(), ow.flush()


def ref_write_vocabulary(model, df_order):
    """df_order='reference': the §1.4 quirk — dfs from the UNFILTERED
    postings vec in first-occurrence order. 'intended': each sorted
    term's own df (what our export writes)."""
    w = RefBitsWriter()
    w.write_vbyte(len(model["term_index_map"]))
    prev = ""
    for term in model["term_index_map"]:
        p = len_common_prefix(prev, term)
        w.write_gamma(p)
        w.write_str(term[p:])
        prev = term
    if df_order == "reference":
        for plist in model["postings"]:
            w.write_vbyte(len(plist))
    else:
        for idx in model["term_index_map"].values():
            w.write_vbyte(len(model["postings"][idx]))
    return w.flush()


def ref_write_documents(model):
    w = RefBitsWriter()
    w.write_vbyte(len(model["documents"]))
    prev = ""
    for path, length in model["documents"]:
        p = len_common_prefix(prev, path)
        w.write_gamma(p)
        w.write_str(path[p:])
        w.write_vbyte(length)
        prev = path
    return w.flush()


def len_common_prefix(a, b):
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


FIXTURE = [
    ("test_data/docs/1.txt", "hello world"),
    ("test_data/docs/2.txt", "hello man"),
    ("test_data/docs/3.txt", "man world"),
]

ZETA = [
    ("z/1.txt", "zeta alpha"),
    ("z/2.txt", "zeta beta"),
    ("z/3.txt", "zeta"),
]


def _export(spark, tmp_path, corpus, name):
    rows = [(u, _EPOCH, wrap_html(t), t, "en") for u, t in corpus]
    wt = spark.createDataFrame(rows, schema=WEBTEXT_SCHEMA)
    out = str(tmp_path / f"idx_{name}")
    build_index(spark, wt, out, min_f=0, max_p=1.0, corpus_fingerprint=name)
    idx = SearchIndex.load(spark, out)
    prefix = str(tmp_path / name / "idx")
    export_reference_index(idx, prefix)
    return {
        ext: open(f"{prefix}.{ext}", "rb").read()
        for ext in ["postings", "offsets", "alphas", "docs"]
    }


def test_fixture_export_is_byte_identical(spark, tmp_path):
    got = _export(spark, tmp_path, FIXTURE, "fix3")
    model = build_model(FIXTURE)
    want_p, want_o = ref_write_postings(model)
    assert got["postings"] == want_p
    assert got["offsets"] == want_o
    assert got["docs"] == ref_write_documents(model)
    # all dfs equal 2 here, so even the reference df order coincides:
    # full byte identity on alphas against BOTH orders
    assert got["alphas"] == ref_write_vocabulary(model, "intended")
    assert got["alphas"] == ref_write_vocabulary(model, "reference")


def test_df_order_divergence_is_exactly_the_documented_one(spark, tmp_path):
    """Corpus where first-occurrence order != sorted order AND dfs
    differ: zeta(df 3) occurs first but sorts last. postings/offsets/
    docs stay byte-identical; alphas differ from the reference's
    quirk-order bytes exactly in the df block."""
    got = _export(spark, tmp_path, ZETA, "zeta3")
    model = build_model(ZETA)
    want_p, want_o = ref_write_postings(model)
    assert got["postings"] == want_p
    assert got["offsets"] == want_o
    assert got["docs"] == ref_write_documents(model)

    intended = ref_write_vocabulary(model, "intended")
    reference = ref_write_vocabulary(model, "reference")
    assert got["alphas"] == intended
    assert intended != reference

    # the divergence is ONLY the df block: decode both; terms identical,
    # dfs are the same multiset permuted first-occurrence vs sorted
    from search_rs_spark.functions.codecs import BitReader

    def decode_alphas(data):
        r = BitReader(data)
        n = r.read_vbyte()
        terms, prev = [], ""
        for _ in range(n):
            p = r.read_gamma()
            t = prev[:p] + r.read_str()
            terms.append(t)
            prev = t
        return terms, [r.read_vbyte() for _ in range(n)]

    t_i, df_i = decode_alphas(intended)
    t_r, df_r = decode_alphas(reference)
    assert t_i == t_r == sorted(model["term_index_map"])
    assert df_i == [1, 1, 3]  # alpha, beta, zeta — each term's own df
    assert df_r == [3, 1, 1]  # first-occurrence: zeta, alpha, beta


def test_roundtrip_reader_agrees_with_fixture_semantics(spark, tmp_path):
    got = _export(spark, tmp_path, FIXTURE, "fix3rt")
    import os

    prefix = str(tmp_path / "fix3rt" / "idx")
    loaded = load_reference_index(prefix)
    assert loaded["terms"] == ["hello", "man", "world"]
    assert loaded["dfs"] == [2, 2, 2]
    assert loaded["postings"][0] == [(0, 1, [0]), (1, 1, [0])]  # hello
    assert loaded["postings"][1] == [(1, 1, [1]), (2, 1, [0])]  # man
    assert loaded["postings"][2] == [(0, 1, [1]), (2, 1, [1])]  # world
    assert loaded["docs"] == [
        ("test_data/docs/1.txt", 2),
        ("test_data/docs/2.txt", 2),
        ("test_data/docs/3.txt", 2),
    ]