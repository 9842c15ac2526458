"""Parity over the REFERENCE'S OWN query-string corpus.

Query strings mined from the reference's test greps of `parseQuery("...")`
(SplitQueryParsingComprehensiveTest.java, JsonAndQueryParsingTest.java,
IpAddressQueryTest.java, EndToEndTest greps) — each shape runs through our
parser -> engine and must match the independent golden scorer (text/keyword/
fast shapes) or a direct DataFrame computation (json / ip shapes golden
doesn't model).
"""

import json as jsonlib

import pandas as pd
import pytest

from pyspark.sql import functions as F

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.parser import parse_query
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher

from tests.golden import GoldenIndex

N = 120
_WORDS = ["machine", "learning", "quantum", "computing", "algorithms",
          "searchable", "device", "fox", "engine", "science", "data"]


def _mk_corpus():
    rows = []
    for i in range(N):
        words = [_WORDS[(i + j) % len(_WORDS)] for j in range(1 + i % 6)]
        if i % 10 == 0:
            words += ["machine", "learning"]  # adjacent -> phrase hits
        content = " ".join(words)
        rows.append({
            "doc_id": i,
            "content": content,
            "category": ["electronics", "health", "technology",
                         "sports"][i % 4],
            "score": (i * 7) % 100,
            "ip_addr": f"192.168.{i % 3}.{i % 250}" if i % 5 else
                       f"10.0.0.{i % 250}",
            "payload": jsonlib.dumps({"user": f"user_{i % 4}",
                                      "active": i % 2 == 0,
                                      "score": i % 5,
                                      "version": i % 3}),
        })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def ref_env(spark, tmp_path_factory):
    pdf = _mk_corpus()
    cfg = IndexConfig(
        fields=[FieldConfig("content", "text"),
                FieldConfig("category", "string"),
                FieldConfig("score", "i64", fast=True),
                FieldConfig("ip_addr", "ip"),
                FieldConfig("payload", "json")],
        id_cols=["doc_id", "category", "score"])
    idx = str(tmp_path_factory.mktemp("refq"))
    build_index(spark, spark.createDataFrame(pdf), cfg, idx,
                doc_id_col="doc_id")
    golden = GoldenIndex(pdf, "doc_id", text_fields={"content": "default"},
                         keyword_fields=["category"],
                         fast_fields=["score"])
    return IndexSearcher(spark, idx), golden, pdf


# reference query shapes expressible in the golden scorer
GOLDEN_QUERIES = [
    "content:searchable",
    "machine learning",                       # bare terms = implicit OR
    "machine AND learning",
    "quantum AND (computing OR algorithms)",
    "category:electronics AND content:device",
    "category:technology",
    "category:nonexistent AND content:device",
    "score:[80 TO *]",
    "doc_id:[10 TO 20]",
    "content:\"machine learning\"",
    "content:mach*",
    "content:/.*fox.*/",
    "content:machne~",
    "-content:fox content:machine",
    "+content:machine -category:sports",
    "content:*",
]


@pytest.mark.parametrize("qs", GOLDEN_QUERIES)
def test_reference_query_shapes_match_golden(ref_env, qs):
    s, golden, _ = ref_env
    q = parse_query(qs, ["content"])
    got = [(r["doc_id"], round(r["score"], 6))
           for r in s.search(q, limit=30).collect()]
    want = [(d, round(sc, 6)) for d, sc in golden.topk(q, 30)]
    assert got == want, f"mismatch for {qs!r}"


def test_reference_ip_queries(ref_env):
    s, _, pdf = ref_env
    import ipaddress
    def members(pred):
        return {int(r.doc_id) for r in pdf.itertuples() if pred(r.ip_addr)}
    cases = {
        "ip_addr:192.168.1.*":
            members(lambda ip: ip.startswith("192.168.1.")),
        "ip_addr:192.168.1.0/24":
            members(lambda ip: ipaddress.ip_address(ip) in
                    ipaddress.ip_network("192.168.1.0/24")),
        "ip_addr:192.168.1.0/24 OR ip_addr:10.0.0.0/8":
            members(lambda ip: ipaddress.ip_address(ip) in
                    ipaddress.ip_network("192.168.1.0/24")) |
            members(lambda ip: ipaddress.ip_address(ip) in
                    ipaddress.ip_network("10.0.0.0/8")),
    }
    for qs, want in cases.items():
        q = parse_query(qs, ["content"])
        got = {r["doc_id"] for r in s.score_query(q).collect()}
        assert got == want, f"mismatch for {qs!r}"


def test_reference_json_queries(ref_env):
    s, _, pdf = ref_env
    payloads = {int(r.doc_id): jsonlib.loads(r.payload)
                for r in pdf.itertuples()}
    cases = {
        "payload.user:user_0":
            {d for d, p in payloads.items() if p["user"] == "user_0"},
        "payload.active:true":
            {d for d, p in payloads.items() if p["active"] is True},
        "payload.score:[2 TO 3]":
            {d for d, p in payloads.items() if 2 <= p["score"] <= 3},
        "payload.user:user_1 AND payload.version:2":
            {d for d, p in payloads.items()
             if p["user"] == "user_1" and p["version"] == 2},
        "payload.user:*":
            set(payloads),
    }
    for qs, want in cases.items():
        q = parse_query(qs, ["content"])
        got = {r["doc_id"] for r in s.score_query(q).collect()}
        assert got == want, f"mismatch for {qs!r}"


def test_regex_case_insensitive_flag(ref_env, spark, tmp_path):
    """`/pattern/i` parses (RegexQuerySplitTest.java:107) and matches
    case-insensitively on a raw (case-preserving) keyword field."""
    s, golden, _ = ref_env
    q = parse_query("content:/\\bmachine\\b/i", ["content"])
    assert isinstance(q, Q.Regex) and q.pattern.startswith("(?i)")
    got = {r["doc_id"] for r in s.score_query(q).collect()}
    plain = {r["doc_id"] for r in
             s.score_query(parse_query("content:/machine/", ["content"])).collect()}
    assert got == plain  # text terms are lowercased; flag is a no-op here
    # where it matters: a case-preserving STRING field
    pdf = pd.DataFrame({"doc_id": [0, 1, 2],
                        "tag": ["Machine", "machine", "other"],
                        "body": ["x", "y", "z"]})
    cfg = IndexConfig(fields=[FieldConfig("body", "text"),
                              FieldConfig("tag", "string")],
                      id_cols=["doc_id", "tag"])
    idx = str(tmp_path / "ci")
    build_index(spark, spark.createDataFrame(pdf), cfg, idx, doc_id_col="doc_id")
    s2 = IndexSearcher(spark, idx)
    ci = {r["doc_id"] for r in
          s2.score_query(parse_query("tag:/machine/i", ["body"])).collect()}
    cs = {r["doc_id"] for r in
          s2.score_query(parse_query("tag:/machine/", ["body"])).collect()}
    assert ci == {0, 1} and cs == {1}


def test_pure_negative_boolean(ref_env):
    """`NOT foo` / `-field:v` alone matches all non-excluded docs (quickwit
    injects an implicit AllQuery positive clause)."""
    s, golden, pdf = ref_env
    for qs in ("NOT content:fox", "-category:sports"):
        q = parse_query(qs, ["content"])
        got = {r["doc_id"] for r in s.score_query(q).collect()}
        want = {d for d, _ in golden.score(q).items()}
        assert got == want and got, f"mismatch for {qs!r}"
    # everything minus fox == complement
    fox = {r["doc_id"] for r in
           s.score_query(parse_query("content:fox", ["content"])).collect()}
    notfox = {r["doc_id"] for r in
              s.score_query(parse_query("NOT content:fox", ["content"])).collect()}
    assert notfox == set(range(N)) - fox
