"""Fuzz coverage:
1. SQL-vs-pandas tokenizer equality on adversarial strings (the bit-for-bit
   claim behind using the JVM fast path for builds).
2. Random query sweep: engine top-k vs the independent golden scorer.
"""

import math
import random

import numpy as np
import pytest

from tantivy4java_spark import queries as Q
from tantivy4java_spark.analysis import sql_tokenize_expr, tokenize_text
from tantivy4java_spark.build import build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher

from tests.golden import GoldenIndex


def _nasty_strings(n=400, seed=7):
    rng = random.Random(seed)
    pools = [
        "abc XYZ 123 ",
        "àéîõü ÆØÅ ß ",
        "中文 日本語 한국어 ",
        "_under_score_ kebab-case dot.sep ",
        "!@#$%^&*()[]{};:'\",<>/?\\|`~ ",
        "\t\n\r  ",
        "x" * 60 + " ",
        "中" * 90 + " ",
        "mixed中engl123ish ",
        "écombining ",
    ]
    out = []
    for _ in range(n):
        k = rng.randint(1, 6)
        out.append("".join(rng.choice(pools) for _ in range(k)))
    out += ["", " ", "x" * 256, "y" * 255, "中" * 86, "中" * 85]
    return out


def test_sql_tokenizer_fuzz_equals_python(spark):
    from pyspark.sql import functions as F
    strings = _nasty_strings()
    df = spark.createDataFrame([(s,) for s in strings], ["text"])
    got = df.select("text", sql_tokenize_expr(F.col("text")).alias("toks")).collect()
    for row in got:
        expected = tokenize_text(row["text"] or "")
        actual = [(s["term"], s["pos"]) for s in row["toks"]]
        assert actual == expected, f"tokenizer divergence on {row['text']!r}"


@pytest.fixture(scope="module")
def sweep_setup(spark, tmp_path_factory):
    pdf = generate_pandas(0, 400, seed=99, min_tokens=15, max_tokens=120)
    pdf["doc_id"] = range(len(pdf))
    cfg = IndexConfig(
        fields=[FieldConfig("content", "text"), FieldConfig("lang", "string"),
                FieldConfig("repo", "string")],
        id_cols=["doc_id", "lang", "repo"], content_col="content",
        shard_bits=7)
    idx = str(tmp_path_factory.mktemp("sweep_idx"))
    build_index(spark, spark.createDataFrame(pdf), cfg, idx,
                doc_id_col="doc_id", num_segments=3)
    golden = GoldenIndex(pdf, "doc_id", {"content": "default"},
                         keyword_fields=["lang", "repo"])
    return IndexSearcher(spark, idx), golden, pdf


def _random_queries(vocab, langs, repos, bigrams, n=32, seed=13):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        shape = rng.randrange(9)
        t = lambda: Q.Term("content", rng.choice(vocab))
        if shape == 0:
            out.append(t())
        elif shape == 1:
            out.append(Q.Boolean(must=[t(), t()]))
        elif shape == 2:
            out.append(Q.Boolean(should=[t(), t(), t()]))
        elif shape == 3:
            out.append(Q.Boolean(must=[t(), Q.Term("lang", rng.choice(langs))],
                                 must_not=[Q.Term("repo", rng.choice(repos))]))
        elif shape == 4:
            out.append(Q.DisMax([t(), t()], tie_breaker=rng.choice([0.0, 0.3, 1.0])))
        elif shape == 5:
            out.append(Q.Boolean(should=[Q.Boost(t(), 2.5), t()]))
        elif shape == 6:
            out.append(Q.Phrase("content", list(rng.choice(bigrams)),
                                slop=rng.choice([0, 0, 1, 2])))
        elif shape == 7:
            out.append(Q.Boolean(should=[t(), t(), t()],
                                 minimum_should_match=2))
        else:
            out.append(Q.TermSet("content",
                                 [rng.choice(vocab) for _ in range(3)]))
    return out


@pytest.mark.parametrize("path", ["local", "cluster"])
def test_golden_query_sweep(sweep_setup, monkeypatch, path):
    """Random query trees vs the independent golden scorer, run through BOTH
    execution paths: the driver-side fast path (default) and the cluster
    scoring path (forced by zeroing the local budget) must each match the
    golden ranking exactly — the three-way agreement pins local == cluster
    == golden on every sampled shape."""
    searcher, golden, pdf = sweep_setup
    if path == "cluster":
        monkeypatch.setattr(IndexSearcher, "LOCAL_TOPK_MAX_ROWS", 0)
        searcher = IndexSearcher(searcher.spark, searcher.index_dir)
    vocab = sorted({w for txt in pdf["content"].head(100) for w in txt.split()})
    langs = sorted(pdf["lang"].unique())
    repos = sorted(pdf["repo"].unique())
    bigrams = sorted({(a, b) for txt in pdf["content"].head(60)
                      for a, b in zip(txt.split(), txt.split()[1:])
                      if a != b})
    for qi, q in enumerate(_random_queries(vocab, langs, repos, bigrams)):
        got = [(int(r["doc_id"]), float(r["score"]))
               for r in searcher.search(q, limit=10).collect()]
        want = golden.topk(q, 10)
        assert len(got) == len(want), f"query {qi} {q}: count"
        for (gd, gs), (ed, es) in zip(got, want):
            assert gd == ed, f"query {qi} {q}: rank order"
            assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-12), \
                f"query {qi} {q}: score {gs} vs {es}"
