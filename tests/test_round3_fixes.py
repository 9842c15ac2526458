"""Regression tests for the round-2 VERDICT/ADVICE findings.

1. Versioned manifest (_manifest/<n>.json per action, txlog shape —
   native/src/txlog/actions.rs:25-37): concurrent appends lose nothing;
   legacy manifest.jsonl indexes stay readable.
2. Fuzzy term expansion is capped like regex/wildcard (no unbounded
   driver collect).
3. Timestamp query bounds are UTC-anchored regardless of the session
   timezone (reference DATE semantics are UTC).
4. apply_deletes refuses to destroy uncommitted segment adds.
5. index_changes tombstones prior versions of changed keys (upsert, not
   duplicate).
6. build() resume refuses to run after an apply_deletes compaction
   (would resurrect deleted docs).
"""

import datetime as dtm
import json
import os
import threading

import pandas as pd
import pytest

from tantivy4java_spark import fsio, manifest
from tantivy4java_spark import maintenance as M
from tantivy4java_spark import queries as Q
from tantivy4java_spark.build import IndexBuilder, build_index
from tantivy4java_spark.corpus import generate_pandas
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.searcher import IndexSearcher
from tantivy4java_spark.streaming import add_documents, index_changes


def _cfg():
    return IndexConfig(fields=[FieldConfig("content", "text"),
                               FieldConfig("lang", "string")],
                       id_cols=["doc_id", "lang"], content_col="content")


# -- 1. versioned manifest ----------------------------------------------------

def test_manifest_actions_are_versioned_files(spark, tmp_path):
    idx = str(tmp_path / "vmf")
    pdf = generate_pandas(0, 30, min_tokens=10, max_tokens=20)
    pdf["doc_id"] = range(30)
    build_index(spark, spark.createDataFrame(pdf), _cfg(), idx,
                doc_id_col="doc_id")
    names = sorted(os.listdir(os.path.join(idx, "_manifest")))
    assert all(n.endswith(".json") and n[:8].isdigit() for n in names)
    # contiguous version numbers from zero
    assert [int(n[:8]) for n in names] == list(range(len(names)))
    acts = manifest.read_actions(spark, idx)
    assert acts[0]["action"] == "protocol"
    assert acts[1]["action"] == "metadata"
    assert acts[-1]["action"] == "commit"


def test_manifest_legacy_jsonl_read_compat(spark, tmp_path):
    """A round-2 index (single appended jsonl) still reads, and new actions
    append after it as numbered files."""
    idx = str(tmp_path / "legacy")
    os.makedirs(os.path.join(idx, "_manifest"))
    legacy = [{"action": "protocol", "version": 1},
              {"action": "metadata", "fields": []},
              {"action": "add", "segment": 0, "num_docs": 5}]
    with open(os.path.join(idx, "_manifest", "manifest.jsonl"), "w") as fh:
        for a in legacy:
            fh.write(json.dumps(a) + "\n")
    assert [a["action"] for a in manifest.read_actions(spark, idx)] == \
        ["protocol", "metadata", "add"]
    manifest.append_action(spark, idx, {"action": "commit", "num_docs": 5})
    acts = manifest.read_actions(spark, idx)
    assert [a["action"] for a in acts] == \
        ["protocol", "metadata", "add", "commit"]
    assert os.path.exists(os.path.join(idx, "_manifest", "00000000.json"))


def test_manifest_concurrent_appends_lose_nothing(spark, tmp_path):
    """Two (here: eight) racing writers must all land their actions — the
    round-2 read-modify-write could drop one on object stores."""
    idx = str(tmp_path / "race")
    n_writers, per_writer = 8, 10
    errs = []

    def writer(wid):
        try:
            for i in range(per_writer):
                manifest.append_action(spark, idx,
                                       {"action": "probe", "w": wid, "i": i})
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(w,))
               for w in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    acts = manifest.read_actions(spark, idx)
    got = {(a["w"], a["i"]) for a in acts}
    assert len(acts) == n_writers * per_writer
    assert got == {(w, i) for w in range(n_writers)
                   for i in range(per_writer)}


def test_create_text_exclusive_scheme_root(spark, tmp_path):
    """The exclusive-create primitive through the Hadoop FS path."""
    p = f"file://{tmp_path}/excl/a.json"
    assert fsio.create_text_exclusive(spark, p, "one")
    assert not fsio.create_text_exclusive(spark, p, "two")
    assert fsio.read_text(spark, p) == "one"
    # posix path too
    lp = str(tmp_path / "excl" / "b.json")
    assert fsio.create_text_exclusive(None, lp, "x")
    assert not fsio.create_text_exclusive(None, lp, "y")


def test_manifest_append_on_scheme_root(spark, tmp_path):
    root = f"file://{tmp_path}/sroot"
    manifest.append_action(spark, root, {"action": "protocol"})
    manifest.append_action(spark, root, {"action": "commit"})
    acts = manifest.read_actions(spark, root)
    assert [a["action"] for a in acts] == ["protocol", "commit"]


# -- 2. fuzzy expansion cap ---------------------------------------------------

def test_fuzzy_expansion_capped(spark, tmp_path, monkeypatch):
    # ten 2-char terms all within distance 1 of the query term
    rows = pd.DataFrame({"doc_id": range(10),
                         "content": [f"t{i} filler" for i in range(10)],
                         "lang": ["py"] * 10})
    idx = str(tmp_path / "fuzzcap")
    build_index(spark, spark.createDataFrame(rows), _cfg(), idx,
                doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)
    # sane cap: query works and matches every tN term
    assert s.score_query(Q.Fuzzy("content", "tx", distance=1)).count() == 10
    # pathological dictionary-wide expansion must error, not collect
    monkeypatch.setattr(IndexSearcher, "MAX_TERM_EXPANSIONS", 1)
    with pytest.raises(ValueError, match="expands past 1 terms"):
        s.score_query(Q.Fuzzy("content", "tx", distance=1)).count()


# -- 3. UTC-anchored timestamp bounds ----------------------------------------

def test_timestamp_bounds_utc_anchored_nonutc_session(spark, tmp_path):
    """A doc at 05:00Z must satisfy `ts >= 05:00Z` even when the session
    timezone is America/New_York (naive literals would anchor to -05:00)."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        rows = pd.DataFrame({
            "doc_id": [0, 1, 2],
            "ts": [dtm.datetime(2024, 1, 3, h) for h in (4, 5, 6)],
            "body": ["a", "b", "c"],
        })
        cfg = IndexConfig(fields=[FieldConfig("body", "text"),
                                  FieldConfig("ts", "date", fast=True)],
                          id_cols=["doc_id"])
        idx = str(tmp_path / "tzidx")
        build_index(spark, spark.createDataFrame(rows), cfg, idx,
                    doc_id_col="doc_id")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        s = IndexSearcher(spark, idx)
        got = sorted(r["doc_id"] for r in s.score_query(
            Q.Range("ts", "2024-01-03T05:00:00Z", None, True, True)).collect())
        assert got == [1, 2]
        # naive datetime bounds anchor to UTC as well (reference semantics)
        got2 = sorted(r["doc_id"] for r in s.score_query(
            Q.Range("ts", dtm.datetime(2024, 1, 3, 5), None,
                    True, True)).collect())
        assert got2 == [1, 2]
        # term equality at the exact instant
        got3 = [r["doc_id"] for r in s.score_query(
            Q.Term("ts", "2024-01-03T05:00:00Z")).collect()]
        assert got3 == [1]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


# -- 4. apply_deletes vs uncommitted adds -------------------------------------

def test_apply_deletes_refuses_uncommitted_adds(spark, tmp_path):
    pdf = generate_pandas(0, 60, min_tokens=10, max_tokens=25)
    pdf["doc_id"] = range(60)
    idx = str(tmp_path / "adudix")
    build_index(spark, spark.createDataFrame(pdf), _cfg(), idx,
                doc_id_col="doc_id")
    M.delete_by_query(spark, idx, Q.Range("doc_id", 0, 0))
    extra = generate_pandas(500, 20, min_tokens=10, max_tokens=25)
    add_documents(spark, _cfg(), idx, spark.createDataFrame(extra),
                  commit=False)
    with pytest.raises(ValueError, match="uncommitted segment adds"):
        M.apply_deletes(spark, idx)
    # after committing, it proceeds and the uncommitted docs survive
    add_documents(spark, _cfg(), idx, spark.createDataFrame(
        generate_pandas(900, 1, min_tokens=10, max_tokens=12)), commit=True)
    assert M.apply_deletes(spark, idx) == 1
    s = IndexSearcher(spark, idx)
    assert s.num_docs == 60 - 1 + 20 + 1


# -- 5. index_changes upsert --------------------------------------------------

def test_index_changes_tombstones_prior_versions(spark, tmp_path):
    cfg = IndexConfig(fields=[FieldConfig("content", "text"),
                              FieldConfig("key", "string")],
                      id_cols=["key"], content_col="content")
    idx = str(tmp_path / "icidx")
    snap = str(tmp_path / "icsnap")
    v1 = pd.DataFrame({
        "key": [f"k{i}" for i in range(5)],
        "content": [f"alpha common{i} token" for i in range(5)],
    })
    index_changes(spark, cfg, idx, spark.createDataFrame(v1), snap, ["key"])
    s = IndexSearcher(spark, idx)
    assert s.num_docs == 5
    assert s.score_query(Q.Term("content", "alpha")).count() == 5

    # change one row's content; re-run -> exactly ONE live version of k2
    v2 = v1.copy()
    v2.loc[2, "content"] = "bravo replaced text"
    index_changes(spark, cfg, idx, spark.createDataFrame(v2), snap, ["key"])
    s2 = IndexSearcher(spark, idx)
    assert s2.score_query(Q.Term("key", "k2")).count() == 1
    assert s2.score_query(Q.Term("content", "bravo")).count() == 1
    # the OLD version of k2 must be gone (was the ADVICE bug)
    assert s2.score_query(Q.Boolean(
        must=[Q.Term("content", "alpha"), Q.Term("key", "k2")])).count() == 0

    # unchanged table -> noop (and no spurious tombstones)
    act = index_changes(spark, cfg, idx, spark.createDataFrame(v2), snap,
                        ["key"])
    assert act["action"] == "noop"
    assert IndexSearcher(spark, idx).score_query(Q.MatchAll()).count() == 5

    # append-only mode keeps round-2 behavior (documented escape hatch)
    v3 = v2.copy()
    v3.loc[4, "content"] = "charlie new body"
    index_changes(spark, cfg, idx, spark.createDataFrame(v3), snap, ["key"],
                  on_update="append")
    assert IndexSearcher(spark, idx).score_query(
        Q.Term("key", "k4")).count() == 2


# -- 6. build() resume after compaction ---------------------------------------

def test_build_resume_refused_after_compaction(spark, tmp_path):
    pdf = generate_pandas(0, 50, min_tokens=10, max_tokens=25)
    pdf["doc_id"] = range(50)
    df = spark.createDataFrame(pdf)
    idx = str(tmp_path / "bres")
    build_index(spark, df, _cfg(), idx, doc_id_col="doc_id")
    M.delete_by_query(spark, idx, Q.Range("doc_id", 0, 4))
    M.apply_deletes(spark, idx)
    assert IndexSearcher(spark, idx).num_docs == 45
    b = IndexBuilder(spark, _cfg(), idx)
    with pytest.raises(ValueError, match="compacted"):
        b.build(df, doc_id_col="doc_id")
    # deleted docs stayed deleted
    assert IndexSearcher(spark, idx).num_docs == 45


# -- 7. add_documents on an index with caller-owned doc ids -------------------

def test_add_documents_with_user_doc_ids(spark, tmp_path):
    """An index built with doc_id_col= has caller-owned ids; an incremental
    batch that carries doc_id must use those ids (build_index contract)
    instead of crashing on an ambiguous second internal doc_id column."""
    pdf = generate_pandas(0, 40, min_tokens=10, max_tokens=20)
    pdf["doc_id"] = range(40)
    idx = str(tmp_path / "userids")
    build_index(spark, spark.createDataFrame(pdf), _cfg(), idx,
                doc_id_col="doc_id")

    extra = generate_pandas(1000, 10, min_tokens=10, max_tokens=20)
    extra["doc_id"] = range(10_000, 10_010)
    add_documents(spark, _cfg(), idx, spark.createDataFrame(extra))

    s = IndexSearcher(spark, idx)
    assert s.num_docs == 50
    got = {r.doc_id for r in
           s.score_query(Q.Range("doc_id", 10_000, None)).collect()}
    assert got == set(range(10_000, 10_010))


# -- 8. vectorized sloppy-phrase frequency ------------------------------------

def test_phrase_freq_vectorized_matches_scalar_reference():
    """_phrase_freq slop>0 is a vectorized searchsorted sweep; pin it against
    an INDEPENDENT brute force over all in-order assignments (an anchor
    matches iff ANY ordered choice of positions has total-moves sum
    sum(q_i - q_0 - i) <= slop — Lucene total-moves, round-3 verdict)."""
    import itertools

    import numpy as np
    from tantivy4java_spark.searcher import _phrase_freq

    def brute_ref(arrays, slop):
        if any(a.size == 0 for a in arrays):
            return 0
        count = 0
        for p0 in arrays[0]:
            ok = False
            for combo in itertools.product(*[list(a) for a in arrays[1:]]):
                seq = [int(p0), *[int(c) for c in combo]]
                if all(seq[i] > seq[i - 1] for i in range(1, len(seq))) and \
                        sum(seq[i] - seq[0] - i
                            for i in range(1, len(seq))) <= slop:
                    ok = True
                    break
            if ok:
                count += 1
        return count

    rng = np.random.default_rng(42)
    for _ in range(300):
        nterms = int(rng.integers(2, 6))
        arrays = [np.unique(rng.integers(0, 30, size=int(rng.integers(0, 7)))
                            .astype(np.int64)) for _ in range(nterms)]
        slop = int(rng.integers(1, 5))
        assert _phrase_freq(arrays, slop) == brute_ref(arrays, slop), \
            (slop, [list(a) for a in arrays])


def test_phrase_freq_four_terms_cumulative_budget():
    """Round-3 verdict golden: per-term excesses (1,1,1) sum to 3 — the old
    pairwise budget accepted it at slop=2; total-moves must not."""
    import numpy as np
    from tantivy4java_spark.searcher import _phrase_freq
    arrays = [np.array([0], dtype=np.int64), np.array([2], dtype=np.int64),
              np.array([3], dtype=np.int64), np.array([4], dtype=np.int64)]
    assert _phrase_freq(arrays, 2) == 0
    assert _phrase_freq(arrays, 3) == 1


# -- 9. explain() for Phrase and Fuzzy -----------------------------------------

def test_explain_phrase_and_fuzzy(spark, tmp_path):
    """explain emits a 'phrase' row (phrase-tf + score matching search) with
    per-word idf components, and 'fuzzy-term' rows with edit distances."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {'xray' if i % 3 else 'xrai'} end {i}")
         for i in range(60)], "doc_id long, text string")
    cfg = IndexConfig(fields=[FieldConfig("text", "text")],
                      id_cols=["doc_id"])
    idx = str(tmp_path / "expl")
    build_index(spark, docs, cfg, idx, doc_id_col="doc_id")
    s = IndexSearcher(spark, idx)

    ph = Q.Phrase("text", ["alpha", "beta", "gamma"])
    hit = s.search(ph, limit=1).collect()[0]
    rows = s.explain(ph, hit.doc_id).collect()
    prow = [r for r in rows if r.kind == "phrase"][0]
    assert prow.tf >= 1 and abs(prow.score - hit.score) < 1e-9
    words = {r.term: r.score for r in rows if r.kind == "phrase-term"}
    assert set(words) == {"alpha", "beta", "gamma"}
    # combined phrase idf = sum of the per-word idf components: the phrase
    # score with tf and length known must reconstruct from them
    from tantivy4java_spark.scoring import B, K1
    idf_w = sum(words.values())
    expect = idf_w * prow.tf / (prow.tf + K1 * (1 - B + B * prow.quantized_len
                                                / s.avgdl("text")))
    assert abs(prow.score - expect) < 1e-9

    fq = Q.Fuzzy("text", "xray", distance=1)
    fhit = s.search(fq, limit=1).collect()[0]
    frows = s.explain(fq, fhit.doc_id).collect()
    assert frows and all(r.kind == "fuzzy-term" for r in frows)
    dists = {r.term: r.distance for r in frows}
    assert all(t in ("xray", "xrai") for t in dists)
    assert all(d == (0 if t == "xray" else 1) for t, d in dists.items())
