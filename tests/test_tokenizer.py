"""Tokenizer parity tests.

Golden vector from /root/reference/search/src/engine/preprocessor.rs:31-41.
"""

from search_rs_spark.functions.tokenizer import tokenize, tokenize_and_stem


def test_reference_golden_vector():
    text = "The quick brown, fox jumps over the lazy dog!!!"
    assert tokenize_and_stem(text) == [
        "the",
        "quick",
        "brown",
        "fox",
        "jump",
        "over",
        "the",
        "lazi",
        "dog",
    ]


def test_tokenize_no_stem():
    assert tokenize("Hello, World! 123 foo-bar") == ["hello", "world", "123", "foo", "bar"]


def test_empty_and_none():
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize_and_stem("!!! ??? ...") == []


def test_unicode_stripped():
    # non-ASCII chars are replaced by spaces (regex is ASCII-only classes)
    assert tokenize("café naïve") == ["caf", "na", "ve"]


def test_digits_kept():
    assert tokenize_and_stem("2024 models running") == ["2024", "model", "run"]
