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


def test_term_positions_golden():
    from search_rs_spark.functions.tokenizer import term_positions

    # "the quick the dog": positions per term, first-occurrence order,
    # tf = len(positions) — the reference's per-doc accumulation
    # (builder.rs:87-113) done map-side
    terms, tfs, positions = term_positions(["the", "quick", "the", "dog"])
    assert terms == ["the", "quick", "dog"]
    assert tfs == [2, 1, 1]
    assert positions == [[0, 2], [1], [3]]


def test_term_positions_empty_and_single():
    from search_rs_spark.functions.tokenizer import term_positions

    assert term_positions([]) == ([], [], [])
    assert term_positions(["a"]) == (["a"], [1], [[0]])


def test_term_positions_matches_posexplode_semantics():
    from search_rs_spark.functions.tokenizer import term_positions, tokenize_and_stem

    toks = tokenize_and_stem("The quick brown fox jumps over the lazy dog the end")
    terms, tfs, positions = term_positions(toks)
    # reconstruct (term, pos) pairs and compare against enumerate(toks)
    flat = sorted((t, p) for t, ps, in zip(terms, positions) for p in ps)
    assert flat == sorted((t, i) for i, t in enumerate(toks))
    assert sum(tfs) == len(toks)
    # positions strictly ascending within each term
    assert all(ps == sorted(ps) for ps in positions)


def test_engine_duck_tokens_matches_python_tokenizer_on_unicode():
    """The engine_*_nostem oracles pair the Python build tokenizer with
    ENGINE_DUCK_TOKENS — which must replicate the strip-THEN-lower
    order on inputs where the orders diverge (characters whose
    lowercase maps into ASCII, Unicode whitespace, combining marks)."""
    import duckdb

    from search_rs_spark.functions.tokenizer import tokenize
    from search_rs_spark.operators.sql_parity import ENGINE_DUCK_TOKENS

    cases = [
        "plain ASCII Text 123",
        "Kelvin sign",            # KELVIN SIGN lowers to 'k'
        "İstanbul upper dotted I", # 'İ' lowers to 'i' + combining dot
        "non breaking space",
        "mixed ÀΒÇ123 ünïcode wörds",
        "tabs\tand\nnewlines\r\nok",
        "punct!!!heavy...text--here",
        "",
    ]
    con = duckdb.connect()
    for text in cases:
        got = con.execute(
            f"SELECT {ENGINE_DUCK_TOKENS} FROM (SELECT ? AS text)", [text]
        ).fetchone()[0]
        assert list(got) == tokenize(text), text
