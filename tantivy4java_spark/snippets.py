"""Snippet / highlight generation (SURVEY.md §2.2 Q18).

Reference surface: SnippetGenerator.create(searcher, query, schema, field),
setMaxNumChars, Snippet.toHtml/getHighlighted/getFragment
(query/SnippetGenerator.java:52-96).  The reference's NATIVE implementation
returns canned values (native/src/query/snippet.rs:14-80); ours is real:
pick the window with the most distinct query-term hits, emit the fragment
plus <b>-tagged HTML, vectorized over a hits DataFrame via mapInPandas.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tantivy4java_spark import queries as Q
from tantivy4java_spark.analysis import tokenize_text


def query_terms(q: Q.Query, field: str) -> List[str]:
    """Collect the query's text terms for one field (for highlighting)."""
    out: List[str] = []

    def walk(node):
        if isinstance(node, Q.Term) and node.field == field:
            toks = tokenize_text(str(node.value), "default")
            out.extend(t for t, _ in toks)
        elif isinstance(node, Q.Phrase) and node.field == field:
            for w in node.words:
                toks = tokenize_text(w, "default")
                out.extend(t for t, _ in toks)
        elif isinstance(node, Q.Boolean):
            for c in list(node.must) + list(node.should):
                walk(c)
        elif isinstance(node, (Q.Boost, Q.ConstScore)):
            walk(node.child)
        elif isinstance(node, Q.DisMax):
            for c in node.queries:
                walk(c)

    walk(Q.normalize(q))
    return sorted(set(out))


def make_snippet(text: str, terms: List[str],
                 max_num_chars: int = 150) -> Tuple[str, str]:
    """-> (fragment, html).  Best window = most distinct term hits, earliest
    on ties; hits wrapped in <b>..</b> (Snippet.toHtml contract)."""
    if not text or not terms:
        return "", ""
    rex = re.compile(r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b",
                     re.IGNORECASE)
    matches = list(rex.finditer(text))
    if not matches:
        return text[:max_num_chars], ""
    best_start, best_score = 0, -1
    for m in matches:
        lo = max(0, m.start() - max_num_chars // 4)
        window = text[lo:lo + max_num_chars]
        found = {x.group(1).lower() for x in rex.finditer(window)}
        score = len(found) * 1000 - lo // 1000
        if score > best_score:
            best_score, best_start = score, lo
    frag = text[best_start:best_start + max_num_chars]
    html = rex.sub(lambda m: f"<b>{m.group(0)}</b>", frag)
    return frag, html


def snippet_df(hits: DataFrame, source: DataFrame, q: Q.Query, field: str,
               id_col: str = "doc_id", max_num_chars: int = 150) -> DataFrame:
    """Hits + doc store -> (doc_id, score, fragment, html); Arrow-batched."""
    terms = query_terms(q, field)
    joined = hits.join(source.select(id_col, field), id_col, "left")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("fragment", T.StringType()),
        T.StructField("html", T.StringType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frags, htmls = [], []
            for txt in pdf[field]:
                f, h = make_snippet(txt or "", terms, max_num_chars)
                frags.append(f)
                htmls.append(h)
            yield pd.DataFrame({"doc_id": pdf[id_col], "score": pdf["score"],
                                "fragment": frags, "html": htmls})

    return joined.mapInPandas(run, schema)
