"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Shape mandated by BASELINE.json input_hint:
  (repo: string, path: string, commit: string, lang: string, content: string)

Properties exercised on purpose:
- Zipf-skewed repos (a few mega-repos hold ~half the rows) -> salted
  repartition / shard skew handling
- per-lang keyword pools with Zipf term frequencies (high-df tokens like
  `import`, `return`, `public` = the stop-word-like skew case)
- identifiers widen the vocabulary (fuzzy/regex/wildcard expansion)
- varied doc lengths -> fieldnorm quantization paths

Fully deterministic AND partition-independent: every sampled value is a pure
function of (seed, doc_index, slot) through a splitmix64 hash — the same
doc_index yields the same row no matter how Spark partitions the range.
Generation is vectorized numpy inside mapInPandas (no per-row Python beyond a
join per document).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LANGS = ["java", "python", "rust", "scala", "go", "md"]
_LANG_WEIGHTS = np.array([0.30, 0.25, 0.15, 0.12, 0.10, 0.08])

_POOLS = {
    "java": ["public", "static", "void", "class", "import", "return", "new", "int",
             "final", "private", "string", "throws", "extends", "implements", "null",
             "boolean", "interface", "package", "override", "synchronized", "shuffle",
             "partition", "executor", "driver", "broadcast", "catalyst", "tungsten"],
    "python": ["def", "import", "return", "self", "class", "none", "true", "false",
               "lambda", "yield", "async", "await", "raise", "except", "dataframe",
               "pandas", "numpy", "spark", "shuffle", "partition", "udf", "arrow"],
    "rust": ["fn", "let", "mut", "impl", "pub", "struct", "enum", "match", "return",
             "unsafe", "trait", "async", "tokio", "segment", "posting", "merge",
             "tantivy", "index", "scorer", "shuffle"],
    "scala": ["def", "val", "var", "object", "class", "import", "return", "implicit",
              "case", "match", "trait", "extends", "rdd", "dataset", "shuffle",
              "partition", "executor", "catalyst"],
    "go": ["func", "return", "import", "package", "defer", "chan", "interface",
           "struct", "goroutine", "select", "range", "shuffle", "partition", "merge"],
    "md": ["the", "index", "merge", "query", "search", "shuffle", "partition",
           "documentation", "example", "usage", "install", "build", "benchmark"],
}
_N_IDENTIFIERS = 800  # shared identifier vocabulary: var123, helper42, ...

_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
])

_EXT = {"java": "java", "python": "py", "rust": "rs", "scala": "scala",
        "go": "go", "md": "md"}


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(seed: int, idx: np.ndarray, slot: int) -> np.ndarray:
    h = _splitmix64(idx.astype(np.uint64)
                    ^ _splitmix64(np.uint64(seed * 1_000_003 + slot)
                                  * np.ones_like(idx, dtype=np.uint64)))
    return h.astype(np.float64) / float(2**64)


def _zipf_cdf(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    return np.cumsum(w / w.sum())


def _make_vocab(lang: str) -> np.ndarray:
    kw = _POOLS[lang]
    idents = [f"var{i}" for i in range(_N_IDENTIFIERS // 2)] + \
             [f"fn{i}" for i in range(_N_IDENTIFIERS // 2)]
    return np.array(kw + idents, dtype=object)


_VOCABS = {lang: _make_vocab(lang) for lang in LANGS}
_VOCAB_CDFS = {lang: _zipf_cdf(len(v)) for lang, v in _VOCABS.items()}
_LANG_CDF = np.cumsum(_LANG_WEIGHTS / _LANG_WEIGHTS.sum())


# combined dictionary across languages (content tokens are drawn per lang
# with a per-lang offset into this single arrow dictionary)
_VOCAB_OFFSETS = {}
_ALL_VOCAB: List[str] = []
for _lang in LANGS:
    _VOCAB_OFFSETS[_lang] = len(_ALL_VOCAB)
    _ALL_VOCAB.extend(_VOCABS[_lang].tolist())


def generate_pandas(start: int, count: int, seed: int = 42, n_repos: int = 50,
                    min_tokens: int = 30, max_tokens: int = 400) -> pd.DataFrame:
    """Generate rows for doc indexes [start, start+count).

    Fully vectorized (byte-identical to the original per-doc formulation,
    pinned by tests): token sampling is one flat splitmix64/searchsorted
    pass over all token slots; content strings are assembled in Arrow C++
    (dictionary cast + binary_join) instead of a per-doc Python " ".join;
    commit hex strings come from a big-endian structured-array hex dump.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if count <= 0:
        return pd.DataFrame({c: pd.Series([], dtype=object)
                             for c in ("repo", "path", "commit",
                                       "lang", "content")})
    idx = np.arange(start, start + count, dtype=np.uint64)
    repo_cdf = _zipf_cdf(n_repos, s=1.3)  # mega-repo skew
    repo_ix = np.searchsorted(repo_cdf, _u01(seed, idx, 1))
    lang_ix = np.searchsorted(_LANG_CDF, _u01(seed, idx, 2))
    ntok = (min_tokens + (_u01(seed, idx, 3) ** 2.0)
            * (max_tokens - min_tokens)).astype(np.int64)  # skew to short docs

    repos = np.array([f"org{i % 7}/repo{i}" for i in range(n_repos)], dtype=object)
    langs = np.array(LANGS, dtype=object)
    out_repo = repos[repo_ix]
    out_lang = langs[lang_ix]

    # ---- contents: one flat pass over all token slots -------------------
    total = int(ntok.sum())
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(ntok, out=offsets[1:])
    doc_rep = np.repeat(np.arange(count), ntok)
    # per-doc slots 0..n-1, flattened; same uint64 wraparound arithmetic
    slot_flat = (np.arange(total, dtype=np.int64)
                 - offsets[doc_rep]).astype(np.uint64)
    u_flat = (_splitmix64(slot_flat
                          + idx[doc_rep] * np.uint64(1_000_000_007)
                          + np.uint64(seed)).astype(np.float64) / float(2**64))
    tok_ix = np.empty(total, dtype=np.int32)
    lang_rep = lang_ix[doc_rep]
    for li, lang in enumerate(LANGS):
        m = lang_rep == li
        if m.any():
            tok_ix[m] = (_VOCAB_OFFSETS[lang]
                         + np.searchsorted(_VOCAB_CDFS[lang], u_flat[m]))
    tok_str = pc.cast(pa.DictionaryArray.from_arrays(
        pa.array(tok_ix, type=pa.int32()), pa.array(_ALL_VOCAB)), pa.string())
    lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), tok_str)
    contents = pc.binary_join(lists, " ").to_pandas()

    # ---- paths / commits ------------------------------------------------
    h1 = _splitmix64(idx * np.uint64(3) + np.uint64(1))
    h2 = _splitmix64(idx * np.uint64(3) + np.uint64(2))
    mt = pa.array(np.where(h1 % np.uint64(3) != 0, "main", "test"))
    d97 = pc.cast(pa.array(h1 % np.uint64(97)), pa.string())
    di_s = pc.cast(pa.array(idx), pa.string())
    ext = pa.array([_EXT[lg] for lg in out_lang])
    paths = pc.binary_join_element_wise(
        "src/", mt, "/d", d97, "/f", di_s, ".", ext, "").to_pandas()
    rec = np.empty(count, dtype=[("a", ">u8"), ("b", ">u8"), ("c", ">u4")])
    rec["a"] = h1
    rec["b"] = h2
    rec["c"] = (h1 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hexbuf = rec.tobytes().hex().encode("ascii")
    commits = pc.cast(pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(40), count, [None, pa.py_buffer(hexbuf)]),
        pa.string()).to_pandas()
    return pd.DataFrame({
        "repo": out_repo, "path": paths, "commit": commits,
        "lang": out_lang, "content": contents,
    })


def corpus_df(spark: SparkSession, n_docs: int, seed: int = 42,
              partitions: int | None = None, **kw) -> DataFrame:
    """Distributed deterministic corpus: same rows for any partitioning."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            if ids.size == 0:
                continue
            # ids from spark.range are contiguous per partition
            yield generate_pandas(int(ids[0]), ids.size, seed=seed, **kw)

    return spark.range(0, n_docs, 1, parts).mapInPandas(gen, _SCHEMA)
