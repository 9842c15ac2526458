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


def generate_pandas(start: int, count: int, seed: int = 42, n_repos: int = 50,
                    min_tokens: int = 30, max_tokens: int = 400) -> pd.DataFrame:
    """Generate rows for doc indexes [start, start+count)."""
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
    contents: List[str] = []
    paths: List[str] = []
    commits: List[str] = []
    for j in range(count):
        di = int(idx[j])
        lang = out_lang[j]
        vocab, cdf = _VOCABS[lang], _VOCAB_CDFS[lang]
        n = int(ntok[j])
        slots = np.arange(n, dtype=np.uint64)
        u = (_splitmix64(slots + np.uint64(di) * np.uint64(1_000_000_007)
                         + np.uint64(seed)).astype(np.float64) / float(2**64))
        toks = vocab[np.searchsorted(cdf, u)]
        contents.append(" ".join(toks))
        h1 = int(_splitmix64(np.array([di * 3 + 1], dtype=np.uint64))[0])
        h2 = int(_splitmix64(np.array([di * 3 + 2], dtype=np.uint64))[0])
        paths.append(f"src/{'main' if h1 % 3 else 'test'}/d{h1 % 97}/f{di}.{_EXT[lang]}")
        commits.append(f"{h1:016x}{h2:016x}{h1 % (1 << 32):08x}")
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
