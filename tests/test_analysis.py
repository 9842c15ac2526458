"""Tokenizer golden tests — the reference contract bit-for-bit
(reference analogs: TextAnalyzerTest.java, TokenLengthLimitTest.java,
DefaultTokenizerCaseTest.java)."""

import pandas as pd
import pytest

from tantivy4java_spark.analysis import (
    DEFAULT_TOKEN_LIMIT, parse_tokenizer_name, sql_tokenize_expr,
    tokenize_series, tokenize_text)


def test_default_tokenizer_split_lower():
    assert tokenize_text("Hello, World! FOO_bar") == [
        ("hello", 0), ("world", 1), ("foo", 2), ("bar", 3)]


def test_underscore_splits():
    # Rust char::is_alphanumeric excludes '_'
    assert [t for t, _ in tokenize_text("snake_case_name")] == ["snake", "case", "name"]


def test_no_stopword_removal():
    # README claims stopwords; code does not remove them (text_analyzer.rs:210-216)
    assert [t for t, _ in tokenize_text("the quick THE")] == ["the", "quick", "the"]


def test_numbers_kept():
    assert [t for t, _ in tokenize_text("abc123 456")] == ["abc123", "456"]


def test_long_token_dropped_not_truncated():
    long_tok = "x" * 256
    toks = tokenize_text(f"short {long_tok} tail")
    assert [t for t, _ in toks] == ["short", "tail"]
    # position gap preserved (tantivy filters skip tokens, keep positions)
    assert [p for _, p in toks] == [0, 2]


def test_255_byte_token_kept():
    tok = "y" * 255
    assert (tok, 0) in tokenize_text(tok)


def test_utf8_byte_limit():
    # 128 three-byte chars = 384 bytes > 255 -> dropped
    tok = "中" * 128
    assert tokenize_text(f"a {tok} b") == [("a", 0), ("b", 2)]


def test_whitespace_tokenizer_keeps_punct():
    assert [t for t, _ in tokenize_text("Foo-Bar baz!", "whitespace")] == \
        ["foo-bar", "baz!"]


def test_keyword_raw_whole_value():
    assert tokenize_text("Hello World!", "keyword") == [("Hello World!", 0)]
    assert tokenize_text("CaseSensitive", "raw") == [("CaseSensitive", 0)]
    assert tokenize_text("", "raw") == []


def test_tokenizer_name_with_limit():
    assert parse_tokenizer_name("default-64") == ("default", 64)
    assert parse_tokenizer_name("default") == ("default", DEFAULT_TOKEN_LIMIT)
    with pytest.raises(ValueError):
        parse_tokenizer_name("default-0")


def test_series_matches_scalar():
    texts = pd.Series(["Hello, World!", None, "", "a_b c"])
    out = tokenize_series(texts).tolist()
    assert out[0] == tokenize_text("Hello, World!")
    assert out[1] == [] and out[2] == []
    assert out[3] == tokenize_text("a_b c")


def test_sql_path_matches_python_path(spark):
    """The JVM fast path and the pandas golden path must agree bit-for-bit."""
    from pyspark.sql import functions as F
    rows = [
        ("Hello, World! FOO_bar",), ("the quick THE",), ("abc123 456",),
        ("snake_case_name",), (None,), ("",), ("Unicode: café naïve",),
        ("x" * 256 + " tail",), ("trailing space ",), (" lead",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = df.select(sql_tokenize_expr(F.col("text")).alias("toks")).collect()
    for (text,), row in zip(rows, got):
        expected = [{"term": t, "pos": p} for t, p in tokenize_text(text or "")]
        actual = [{"term": s["term"], "pos": s["pos"]} for s in row["toks"]]
        assert actual == expected, f"mismatch for {text!r}"
