"""Independent golden BM25 reference (SURVEY.md §5 methodology).

A deliberately different implementation shape from the Spark engine: plain
Python dicts over a pandas corpus, single process.  Computes the documented
Tantivy scoring model — BM25 k1=1.2 b=0.75, idf = ln(1+(N-df+.5)/(df+.5)),
idf_weight = idf*(k1+1), quantized fieldnorms, exact-global avgdl, combined
(summed) idf for phrases, tie-break by doc_id — over the same AST nodes.
Used to verify the Spark pipeline end to end (rank identity + score equality
within float tolerance).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from tantivy4java_spark import queries as Q
from tantivy4java_spark.analysis import tokenize_text
from tantivy4java_spark.fieldnorm import quantized_length
from tantivy4java_spark.scoring import B, K1, idf_weight


class GoldenIndex:
    def __init__(self, docs: pd.DataFrame, doc_id_col: str,
                 text_fields: Dict[str, str], keyword_fields: List[str] = (),
                 fast_fields: List[str] = ()):
        self.docs = docs.reset_index(drop=True)
        self.doc_ids = docs[doc_id_col].to_numpy()
        self.N = len(docs)
        self.field_types = {}
        # postings[field][term] = {doc_id: (tf, positions)}
        self.postings: Dict[str, Dict[str, Dict[int, Tuple[int, List[int]]]]] = {}
        self.lengths: Dict[str, Dict[int, int]] = {}
        self.avgdl: Dict[str, float] = {}
        for field, tokenizer in text_fields.items():
            self.field_types[field] = "text"
            post = defaultdict(dict)
            lens = {}
            total = 0
            for did, val in zip(self.doc_ids, docs[field]):
                toks = tokenize_text(val, tokenizer)
                lens[int(did)] = len(toks)
                total += len(toks)
                per_term = defaultdict(list)
                for t, p in toks:
                    per_term[t].append(p)
                for t, ps in per_term.items():
                    post[t][int(did)] = (len(ps), ps)
            self.postings[field] = dict(post)
            self.lengths[field] = {d: int(quantized_length([n])[0]) for d, n in lens.items()}
            self.avgdl[field] = total / self.N if self.N else 0.0
        for field in keyword_fields:
            self.field_types[field] = "string"
            post = defaultdict(dict)
            for did, val in zip(self.doc_ids, docs[field]):
                if val is None:
                    continue
                post[str(val)][int(did)] = (1, [0])
            self.postings[field] = dict(post)
            self.lengths[field] = {int(d): 1 for d in self.doc_ids}
            self.avgdl[field] = 1.0
        for field in fast_fields:
            self.field_types[field] = "fast"

    # -- scoring ------------------------------------------------------------
    def _bm25(self, field: str, term: str) -> Dict[int, float]:
        plist = self.postings.get(field, {}).get(term, {})
        if not plist:
            return {}
        w = idf_weight(len(plist), self.N)
        avgdl = self.avgdl[field]
        out = {}
        for did, (tf, _) in plist.items():
            L = self.lengths[field][did]
            out[did] = w * tf / (tf + K1 * (1.0 - B + B * L / avgdl))
        return out

    def score(self, q: Q.Query) -> Dict[int, float]:
        q = Q.normalize(q)
        if isinstance(q, Q.Term):
            ft = self.field_types.get(q.field)
            if ft == "text":
                toks = tokenize_text(str(q.value), "default")
                if not toks:
                    return {}
                return self._bm25(q.field, toks[0][0])
            if ft == "string":
                return self._bm25(q.field, str(q.value))
            col = self.docs.set_index(self.docs.columns[0], drop=False)
            return {int(d): 1.0 for d, v in zip(self.doc_ids, self.docs[q.field])
                    if v == q.value}
        if isinstance(q, Q.TermSet):
            docs = set()
            for v in q.values:
                t = str(v) if self.field_types.get(q.field) == "string" else \
                    (tokenize_text(str(v), "default") or [(None, 0)])[0][0]
                if t is not None:
                    docs.update(self.postings.get(q.field, {}).get(t, {}).keys())
            return {d: 1.0 for d in docs}
        if isinstance(q, Q.MatchAll):
            return {int(d): 1.0 for d in self.doc_ids}
        if isinstance(q, Q.Boolean):
            return self._score_bool(q)
        if isinstance(q, Q.Phrase):
            return self._score_phrase(q)
        if isinstance(q, Q.Boost):
            return {d: s * q.factor for d, s in self.score(q.child).items()}
        if isinstance(q, Q.ConstScore):
            return {d: q.score for d in self.score(q.child)}
        if isinstance(q, Q.DisMax):
            per = [self.score(c) for c in q.queries]
            docs = set().union(*[p.keys() for p in per]) if per else set()
            out = {}
            for d in docs:
                vals = [p.get(d, 0.0) for p in per]
                mx = max(vals)
                out[d] = mx + q.tie_breaker * (sum(vals) - mx)
            return out
        if isinstance(q, Q.Range):
            out = {}
            for did, v in zip(self.doc_ids, self.docs[q.field]):
                if v is None:
                    continue
                if q.lower is not None and (v < q.lower or (v == q.lower and not q.include_lower)):
                    continue
                if q.upper is not None and (v > q.upper or (v == q.upper and not q.include_upper)):
                    continue
                out[int(did)] = 1.0
            return out
        if isinstance(q, Q.Exists):
            return {int(d): 1.0 for d, v in zip(self.doc_ids, self.docs[q.field])
                    if v is not None}
        if isinstance(q, (Q.Regex, Q.Wildcard)):
            import re
            pat = q.pattern if isinstance(q, Q.Regex) else Q.wildcard_to_regex(q.pattern)
            flags = ""
            if pat.startswith("(?i)"):
                flags, pat = "(?i)", pat[4:]
            if not pat.startswith("^"):
                pat = "^(?:" + pat + ")$"
            rex = re.compile(flags + pat)
            docs = set()
            for t, plist in self.postings.get(q.field, {}).items():
                if rex.match(t):
                    docs.update(plist.keys())
            return {d: 1.0 for d in docs}
        if isinstance(q, Q.Fuzzy):
            from tantivy4java_spark.searcher import _edit_distance
            toks = tokenize_text(str(q.text), "default") \
                if self.field_types.get(q.field) == "text" else [(str(q.text), 0)]
            if not toks:
                return {}
            text = toks[0][0]
            out: Dict[int, float] = defaultdict(float)
            for t in self.postings.get(q.field, {}):
                if abs(len(t) - len(text)) > q.distance:
                    continue
                if q.prefix and not t.startswith(text[:1]):
                    continue
                if _edit_distance(text, t, q.distance, q.transposition_cost_one) <= q.distance:
                    for d, s in self._bm25(q.field, t).items():
                        out[d] += s
            return dict(out)
        raise TypeError(f"golden: unsupported {type(q).__name__}")

    def _score_bool(self, q: Q.Boolean) -> Dict[int, float]:
        msm = q.minimum_should_match or 0
        must = [self.score(c) for c in q.must]
        should = [self.score(c) for c in q.should]
        nots = set()
        for c in q.must_not:
            nots.update(self.score(c).keys())
        if must:
            docs = set(must[0].keys())
            for m in must[1:]:
                docs &= set(m.keys())
            if msm > 0 and should:
                # explicit minimum_should_match is enforced alongside must
                # (reference SplitBooleanQuery semantics)
                counts = defaultdict(int)
                for s in should:
                    for d in s:
                        counts[d] += 1
                docs &= {d for d, c in counts.items() if c >= msm}
        elif should:
            counts = defaultdict(int)
            for s in should:
                for d in s:
                    counts[d] += 1
            docs = {d for d, c in counts.items() if c >= max(msm, 1)}
        elif q.must_not:
            # pure-negative: implicit AllQuery positive clause (quickwit)
            return {int(d): 1.0 for d in self.doc_ids if int(d) not in nots}
        else:
            docs = set()
        out = {}
        for d in docs:
            if d in nots:
                continue
            total = sum(m.get(d, 0.0) for m in must)
            total += sum(s.get(d, 0.0) for s in should)
            out[d] = total
        return out

    def _score_phrase(self, q: Q.Phrase) -> Dict[int, float]:
        words = [tokenize_text(w, "default")[0][0] for w in q.words
                 if tokenize_text(w, "default")]
        if not words:
            return {}
        if len(words) == 1:
            return self._bm25(q.field, words[0])
        plists = [self.postings.get(q.field, {}).get(w, {}) for w in words]
        if any(not p for p in plists):
            return {}
        docs = set(plists[0].keys())
        for p in plists[1:]:
            docs &= set(p.keys())
        from tantivy4java_spark.searcher import _phrase_freq
        idf_w = sum(idf_weight(len(self.postings[q.field][w]), self.N) for w in words)
        avgdl = self.avgdl[q.field]
        out = {}
        for d in docs:
            arrays = [np.asarray(p[d][1]) for p in plists]
            tf = _phrase_freq(arrays, q.slop)
            if tf > 0:
                L = self.lengths[q.field][d]
                out[d] = idf_w * tf / (tf + K1 * (1.0 - B + B * L / avgdl))
        return out

    def topk(self, q: Q.Query, k: int) -> List[Tuple[int, float]]:
        scored = self.score(q)
        return sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
