"""Golden vectors ported from the reference's unit tests (no Spark).

Boolean parser: /root/reference/search/src/engine/mod.rs:326-351.
Spellcheck/trigram/Levenshtein: engine/vocabulary.rs:170-215.
Set-op quirks: engine/postings.rs:204-248 (pinned via the oracle).
"""

import pytest

from search_rs_spark.operators.boolean import infix_to_postfix
from search_rs_spark.operators.spellcheck import (
    DriverVocabulary,
    levenshtein,
    trigrams,
)

PARSER_VECTORS = [
    ("a AND (b OR NOT c)", ["a", "b", "c", "NOT", "OR", "AND"]),
    ("a AND b OR NOT c", ["a", "b", "AND", "c", "NOT", "OR"]),
    (
        "NOT (a AND b) OR NOT (c OR d)",
        ["a", "b", "AND", "NOT", "c", "d", "OR", "NOT", "OR"],
    ),
    ("a AND b AND c OR d OR e", ["a", "b", "c", "AND", "AND", "d", "e", "OR", "OR"]),
    ("a AND (b OR c)", ["a", "b", "c", "OR", "AND"]),
]


@pytest.mark.parametrize("infix,postfix", PARSER_VECTORS)
def test_infix_to_postfix_goldens(infix, postfix):
    assert infix_to_postfix(infix) == postfix


def test_spellcheck_goldens():
    vocab = DriverVocabulary(terms=["hello", "world"], dfs=[1, 2])
    assert vocab.trigram_index["hel"] == [0]
    assert vocab.trigram_index["ell"] == [0]
    assert vocab.trigram_index["rld"] == [1]
    assert vocab.spellcheck_term("hell") == "hello"
    assert vocab.spellcheck_term("wrld") == "world"
    assert vocab.spellcheck_term("he") is None
    assert vocab.spellcheck_term("hello") == "hello"


def test_spellcheck_tie_break_prefers_higher_df():
    # equal levenshtein distance -> higher df wins (vocabulary.rs:122-127)
    vocab = DriverVocabulary(terms=["cart", "card"], dfs=[1, 5])
    assert vocab.spellcheck_term("carx") == "card"
    # equal (lev, df) -> first in trigram/term_id iteration order wins
    vocab2 = DriverVocabulary(terms=["cart", "card"], dfs=[3, 3])
    assert vocab2.spellcheck_term("carx") == "cart"


LEV_VECTORS = [
    ("hello", "hello", 0),
    ("hello", "", 5),
    ("", "", 0),
    ("cat", "cats", 1),
    ("abc", "xyz", 3),
]


@pytest.mark.parametrize("a,b,d", LEV_VECTORS)
def test_levenshtein_goldens(a, b, d):
    assert levenshtein(a, b) == d
    assert levenshtein(b, a) == d


def test_trigrams():
    assert trigrams("hello") == ["hel", "ell", "llo"]
    assert trigrams("ab") == []
    assert trigrams("abc") == ["abc"]


def test_oracle_set_op_quirks():
    """postings.rs golden vectors incl. the empty-NOT quirk, evaluated
    through the oracle's boolean evaluator."""
    from search_rs_spark.oracle import build_oracle, oracle_boolean_query

    # corpus engineered so terms map to known doc-id lists
    # aa -> {1,3,5,7}; bb -> {2,3,6,7}; cc -> {} (absent)
    docs = []
    for d in range(8):
        words = []
        if d in (1, 3, 5, 7):
            words.append("aa")
        if d in (2, 3, 6, 7):
            words.append("bb")
        words.append("filler")
        docs.append((f"u{d}", " ".join(words)))
    idx = build_oracle(docs)

    res = [d for d, _, _ in oracle_boolean_query(idx, "aa AND bb")]
    assert res == [3, 7]
    res = [d for d, _, _ in oracle_boolean_query(idx, "aa OR bb")]
    assert res == [1, 2, 3, 5, 6, 7]
    res = [d for d, _, _ in oracle_boolean_query(idx, "NOT aa")]
    assert res == [0, 2, 4, 6]
    # NOT of an unknown term (empty list) -> 1..=n including out-of-range n
    res = [d for d, _, _ in oracle_boolean_query(idx, "NOT zzzzz")]
    assert res == list(range(1, 9))
