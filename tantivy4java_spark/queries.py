"""Query AST — the builder-API analog of query/Query.java (SURVEY.md §2.2).

Constructors mirror the reference's static factories (citations inline); the
AST is lowered to DataFrame plans by searcher.py.  Normalizations applied by
``normalize``:
- pure-SHOULD boolean gets minimum_should_match=1
  (native/src/split_query/query_converters.rs:113-126)
- nested single-clause booleans collapse
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import List, Optional, Sequence, Tuple, Union

MUST = "must"
SHOULD = "should"
MUST_NOT = "must_not"  # query/Occur.java:26-28


@dataclass(frozen=True)
class Query:
    def boost(self, b: float) -> "Boost":
        return Boost(self, b)  # query/Query.java:180

    def const_score(self, s: float) -> "ConstScore":
        return ConstScore(self, s)  # query/Query.java:264


@dataclass(frozen=True)
class Term(Query):
    """Exact token match, BM25-scored (query/Query.java:54-66)."""
    field: str
    value: Union[str, int, float, bool]


@dataclass(frozen=True)
class TermSet(Query):
    """Match any of a set of terms, constant score (query/Query.java:77)."""
    field: str
    values: Tuple[Union[str, int, float, bool], ...]

    def __init__(self, field: str, values: Sequence):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "values", tuple(values))


@dataclass(frozen=True)
class MatchAll(Query):
    """query/Query.java:86 — all docs, constant score 1.0."""


@dataclass(frozen=True)
class Boolean(Query):
    """MUST/SHOULD/MUST_NOT (query/Query.java:148)."""
    must: Tuple[Query, ...] = ()
    should: Tuple[Query, ...] = ()
    must_not: Tuple[Query, ...] = ()
    minimum_should_match: Optional[int] = None

    def __init__(self, must=(), should=(), must_not=(), minimum_should_match=None):
        object.__setattr__(self, "must", tuple(must))
        object.__setattr__(self, "should", tuple(should))
        object.__setattr__(self, "must_not", tuple(must_not))
        object.__setattr__(self, "minimum_should_match", minimum_should_match)


@dataclass(frozen=True)
class Phrase(Query):
    """Positional phrase within slop (query/Query.java:127-139).

    Scored with combined idf over the phrase terms and tf = phrase frequency;
    requires the field indexed with positions.
    """
    field: str
    words: Tuple[str, ...]
    slop: int = 0

    def __init__(self, field: str, words: Sequence[str], slop: int = 0):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "words", tuple(words))
        object.__setattr__(self, "slop", slop)


@dataclass(frozen=True)
class Fuzzy(Query):
    """Levenshtein term expansion (query/Query.java:101-117);
    defaults distance=1, transposition_cost_one=True, prefix=False."""
    field: str
    text: str
    distance: int = 1
    transposition_cost_one: bool = True
    prefix: bool = False


@dataclass(frozen=True)
class Regex(Query):
    """Regex over the term dictionary, constant score (query/Query.java:192)."""
    field: str
    pattern: str


@dataclass(frozen=True)
class Wildcard(Query):
    """Glob (* and ?) over the term dictionary (query/Query.java:205-219)."""
    field: str
    pattern: str
    lenient: bool = False


@dataclass(frozen=True)
class Range(Query):
    """Typed range with inclusive/exclusive bounds (query/Query.java:280-297).
    None bound = unbounded."""
    field: str
    lower: Optional[object] = None
    upper: Optional[object] = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class Exists(Query):
    """Field presence (query/Query.java:448)."""
    field: str


@dataclass(frozen=True)
class Boost(Query):
    child: Query
    factor: float


@dataclass(frozen=True)
class ConstScore(Query):
    child: Query
    score: float


@dataclass(frozen=True)
class DisMax(Query):
    """max(clause scores) + tie_breaker * sum(rest) (query/Query.java:159-170)."""
    queries: Tuple[Query, ...]
    tie_breaker: float = 0.0

    def __init__(self, queries: Sequence[Query], tie_breaker: float = 0.0):
        object.__setattr__(self, "queries", tuple(queries))
        object.__setattr__(self, "tie_breaker", tie_breaker)


@dataclass(frozen=True)
class MoreLikeThis(Query):
    """Salient-terms OR query from a source doc (query/Query.java:238-254).

    ``text`` (optional) supplies the seed document's content directly — the
    cheapest path (tokenized driver-side, no cluster read).  Without it, the
    searcher fetches the stored doc via a one-row doc-store lookup
    (set_doc_source), falling back to a shard postings decode."""
    doc_id: int
    field: str
    min_doc_freq: int = 5
    max_doc_freq: Optional[int] = None
    min_term_freq: int = 2
    max_query_terms: int = 25
    boost_factor: float = 1.0
    text: Optional[str] = None


def normalize(q: Query) -> Query:
    """AST normalization (SURVEY.md §4 O5/O6)."""
    if isinstance(q, Boolean):
        must = tuple(normalize(c) for c in q.must)
        should = tuple(normalize(c) for c in q.should)
        must_not = tuple(normalize(c) for c in q.must_not)
        msm = q.minimum_should_match
        # pure-SHOULD -> minimum_should_match=1 (query_converters.rs:113-126)
        if should and not must and msm is None:
            msm = 1
        # single-MUST collapse
        if len(must) == 1 and not should and not must_not:
            return must[0]
        return Boolean(must, should, must_not, msm)
    if isinstance(q, Boost):
        child = normalize(q.child)
        if q.factor == 1.0:
            return child
        return Boost(child, q.factor)
    if isinstance(q, ConstScore):
        return ConstScore(normalize(q.child), q.score)
    if isinstance(q, DisMax):
        return DisMax(tuple(normalize(c) for c in q.queries), q.tie_breaker)
    return q


def wildcard_to_regex(pattern: str) -> str:
    """Glob -> anchored regex (wildcard_analysis.rs:23-96 semantics)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(escape_regex(ch))
    return "^" + "".join(out) + "$"


def escape_regex(ch: str) -> str:
    import re
    return re.escape(ch)


def is_expensive_wildcard(pattern: str) -> bool:
    """Leading-* or multi-* patterns are expensive
    (native/src/split_query/wildcard_analysis.rs:23-96)."""
    return pattern.startswith("*") or pattern.count("*") > 1
