"""Parser tests (reference analogs: QueryParserBasicTest.java,
SplitQueryParsingComprehensiveTest.java, parse-vs-builder equivalence)."""

import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.parser import parse_query, parse_query_lenient

DF = ["content"]


def test_bare_term():
    assert parse_query("shuffle", DF) == Q.Term("content", "shuffle")


def test_bare_term_multi_default_fields():
    q = parse_query("shuffle", ["title", "body"])
    assert q == Q.Boolean(should=(Q.Term("title", "shuffle"),
                                  Q.Term("body", "shuffle")),
                          minimum_should_match=1)


def test_field_scoped():
    assert parse_query("repo:apache/spark", DF) == Q.Term("repo", "apache/spark")


def test_and():
    q = parse_query("content:shuffle AND lang:java", DF)
    assert q == Q.Boolean(must=(Q.Term("content", "shuffle"),
                                Q.Term("lang", "java")))


def test_or_and_precedence():
    q = parse_query("a OR b AND c", DF)
    assert isinstance(q, Q.Boolean)
    assert len(q.should) == 2
    assert q.should[0] == Q.Term("content", "a")
    assert q.should[1] == Q.Boolean(must=(Q.Term("content", "b"),
                                          Q.Term("content", "c")))


def test_implicit_or():
    q = parse_query("hello world", DF)
    assert q == Q.Boolean(should=(Q.Term("content", "hello"),
                                  Q.Term("content", "world")),
                          minimum_should_match=1)


def test_not_and_occurs():
    q = parse_query("+apple -banana cherry", DF)
    assert q.must == (Q.Term("content", "apple"),)
    assert q.must_not == (Q.Term("content", "banana"),)
    assert q.should == (Q.Term("content", "cherry"),)


def test_not_keyword():
    q = parse_query("(content:executor OR content:driver) AND NOT repo:mono", DF)
    assert isinstance(q, Q.Boolean)
    assert Q.Term("repo", "mono") in q.must_not


def test_phrase_with_slop():
    assert parse_query('content:"index merge"~2', DF) == \
        Q.Phrase("content", ["index", "merge"], 2)
    assert parse_query('"public static void"', DF) == \
        Q.Phrase("content", ["public", "static", "void"], 0)


def test_range_inclusive_exclusive():
    assert parse_query("score:[80 TO *]", DF) == Q.Range("score", 80, None, True, True)
    assert parse_query("price:{10.5 TO 20}", DF) == \
        Q.Range("price", 10.5, 20, False, False)
    # ISO datetime bounds lower to TYPED datetimes (naive UTC, microsecond
    # precision) — reference DATE-field semantics
    import datetime as dtm
    assert parse_query("published:[2024-01-01T00:00:00Z TO 2024-06-30T23:59:59Z]", DF) == \
        Q.Range("published", dtm.datetime(2024, 1, 1),
                dtm.datetime(2024, 6, 30, 23, 59, 59), True, True)


def test_wildcard_and_prefix():
    assert parse_query("path:src/main/*", DF) == Q.Wildcard("path", "src/main/*")
    assert parse_query("content:shuf*", DF) == Q.Wildcard("content", "shuf*")
    assert parse_query("content:*wild*", DF) == Q.Wildcard("content", "*wild*")


def test_regex():
    assert parse_query("content:/shu.?fle/", DF) == Q.Regex("content", "shu.?fle")


def test_fuzzy():
    assert parse_query("content:shufle~1", DF) == Q.Fuzzy("content", "shufle", 1)
    assert parse_query("content:shufle~", DF) == Q.Fuzzy("content", "shufle", 1)


def test_exists_and_matchall():
    assert parse_query("content:*", DF) == Q.Exists("content")
    assert parse_query("*", DF) == Q.MatchAll()


def test_field_group_distributes():
    q = parse_query("content:(executor OR driver)", DF)
    assert q == Q.Boolean(should=(Q.Term("content", "executor"),
                                  Q.Term("content", "driver")),
                          minimum_should_match=1)


def test_strict_raises_lenient_warns():
    with pytest.raises(ValueError):
        parse_query("content:(unclosed", DF)
    q, warnings = parse_query_lenient("content:(unclosed", DF)
    assert warnings
    assert q is not None
