"""IP fields + CIDR rewrites (§1.2/O5), snippets (Q18), MoreLikeThis (Q14)."""

import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.iptypes import (cidr_to_range, ip_to_int,
                                        rewrite_ip_query, wildcard_to_range)
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher
from tantivy4java_spark.snippets import make_snippet, query_terms, snippet_df


def test_ip_conversions():
    # unified IPv6 space: v4 maps to ::ffff:a.b.c.d (SchemaBuilder.java:375)
    V4 = 0xFFFF00000000
    assert ip_to_int("0.0.0.1") == V4 + 1
    assert ip_to_int("10.0.0.0") == V4 + 10 * 2**24
    assert ip_to_int("::ffff:192.168.1.1") == ip_to_int("192.168.1.1")
    assert cidr_to_range("10.0.0.0/8") == \
        (f"{V4 + 10 * 2**24:032x}", f"{V4 + 11 * 2**24 - 1:032x}")
    assert wildcard_to_range("192.168.*.*") == \
        (f"{ip_to_int('192.168.0.0'):032x}", f"{ip_to_int('192.168.255.255'):032x}")
    with pytest.raises(ValueError):
        wildcard_to_range("192.*.1.1")  # non-contiguous (parse_query.rs:88-97)
    # FULL IPv6 (no longer the v1 limitation): canonical hex32, numeric order
    from tantivy4java_spark.iptypes import ip_to_hex
    assert ip_to_hex("2001:db8::1") == "20010db8000000000000000000000001"
    lo, hi = cidr_to_range("2001:db8::/32")
    assert lo == "20010db8000000000000000000000000"
    assert hi == "20010db8ffffffffffffffffffffffff"
    assert lo < ip_to_hex("2001:db8::1") < hi  # lexicographic == numeric


def test_rewrite_shapes():
    r = rewrite_ip_query("ip", "10.0.0.0/8")
    assert isinstance(r, Q.Range) and r.field == "_ipnum_ip"
    assert rewrite_ip_query("ip", "not-an-ip") is None


@pytest.fixture(scope="module")
def ip_searcher(spark, tmp_path_factory):
    rows = [(i, f"10.{i % 4}.0.{i % 250}", f"host{i}") for i in range(80)]
    # mix in full-IPv6 docs (80..89) — same index, same fast column
    rows += [(80 + i, f"2001:db8::{i + 1:x}", f"v6host{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "client_ip", "host"])
    cfg = IndexConfig(fields=[FieldConfig("client_ip", "ip"),
                              FieldConfig("host", "string")],
                      id_cols=["doc_id", "host"])
    idx = str(tmp_path_factory.mktemp("ip_idx"))
    build_index(spark, df, cfg, idx, doc_id_col="doc_id")
    return IndexSearcher(spark, idx)


def test_ip_exact(ip_searcher):
    hits = ip_searcher.score_query(Q.Term("client_ip", "10.1.0.1")).collect()
    assert sorted(r["doc_id"] for r in hits) == [1]


def test_ip_cidr(ip_searcher):
    hits = ip_searcher.score_query(Q.Term("client_ip", "10.2.0.0/16")).collect()
    assert sorted(r["doc_id"] for r in hits) == [i for i in range(80) if i % 4 == 2]


def test_ip_wildcard(ip_searcher):
    hits = ip_searcher.score_query(Q.Term("client_ip", "10.3.*.*")).collect()
    assert sorted(r["doc_id"] for r in hits) == [i for i in range(80) if i % 4 == 3]


def test_ipv6_exact_and_cidr(ip_searcher):
    hits = ip_searcher.score_query(Q.Term("client_ip", "2001:db8::3")).collect()
    assert sorted(r["doc_id"] for r in hits) == [82]
    # v6 CIDR covers exactly the ten v6 docs, none of the v4 ones
    hits = ip_searcher.score_query(Q.Term("client_ip", "2001:db8::/32")).collect()
    assert sorted(r["doc_id"] for r in hits) == list(range(80, 90))
    # and a v4 CIDR still excludes every v6 doc
    hits = ip_searcher.score_query(Q.Term("client_ip", "10.0.0.0/8")).collect()
    assert all(d < 80 for d in (r["doc_id"] for r in hits)) and hits


def test_snippet_basic():
    text = "the quick brown fox jumps over the lazy dog near the river bank"
    frag, html = make_snippet(text, ["fox", "dog"], max_num_chars=60)
    assert "fox" in frag
    assert "<b>fox</b>" in html and "<b>dog</b>" in html


def test_query_terms_collection():
    q = Q.Boolean(must=[Q.Term("content", "Fox"),
                        Q.Phrase("content", ["lazy", "dog"])],
                  should=[Q.Term("other", "cat")])
    assert query_terms(q, "content") == ["dog", "fox", "lazy"]


def test_snippet_df_and_mlt(spark, tmp_path):
    pdf = generate_pandas(0, 100, min_tokens=20, max_tokens=60)
    pdf["doc_id"] = range(100)
    cfg = IndexConfig(fields=[FieldConfig("content", "text")],
                      id_cols=["doc_id"], content_col="content")
    idx = str(tmp_path / "snipidx")
    build_index(spark, spark.createDataFrame(pdf), cfg, idx, doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)
    q = Q.Term("content", "import")
    hits = s.search(q, limit=5)
    out = snippet_df(hits, spark.createDataFrame(pdf), q, "content").collect()
    assert len(out) == 5
    assert all("<b>" in r["html"] for r in out)

    # MoreLikeThis: expanded query must rank the source doc first
    seed_doc = int(hits.collect()[0]["doc_id"])
    mlt = Q.MoreLikeThis(doc_id=seed_doc, field="content",
                         min_doc_freq=2, min_term_freq=1, max_query_terms=10)
    top = s.search(mlt, limit=3).collect()
    assert top and top[0]["doc_id"] == seed_doc


def test_ip_range_query(ip_searcher):
    # v4 range on the hex32 fast column (lexicographic == numeric)
    hits = ip_searcher.score_query(
        Q.Range("client_ip", "10.1.0.0", "10.1.0.50")).collect()
    assert sorted(r["doc_id"] for r in hits) == \
        [i for i in range(80) if i % 4 == 1 and i % 250 <= 50]
    # v6 range
    hits = ip_searcher.score_query(
        Q.Range("client_ip", "2001:db8::2", "2001:db8::5")).collect()
    assert sorted(r["doc_id"] for r in hits) == [81, 82, 83, 84]
    # open upper bound reaches across v4-mapped space into v6
    hits = ip_searcher.score_query(
        Q.Range("client_ip", "10.3.0.0", None)).collect()
    ids = sorted(r["doc_id"] for r in hits)
    assert set(range(80, 90)) <= set(ids)
    assert all(i % 4 == 3 or i >= 80 for i in ids)
    # exclusive bounds
    hits = ip_searcher.score_query(
        Q.Range("client_ip", "2001:db8::2", "2001:db8::5",
                include_lower=False, include_upper=False)).collect()
    assert sorted(r["doc_id"] for r in hits) == [82, 83]


def test_ip_range_via_query_string(ip_searcher):
    from tantivy4java_spark.parser import parse_query
    q = parse_query("client_ip:[10.1.0.0 TO 10.1.0.50]", ["client_ip"])
    hits = ip_searcher.score_query(q).collect()
    assert sorted(r["doc_id"] for r in hits) == \
        [i for i in range(80) if i % 4 == 1 and i % 250 <= 50]
