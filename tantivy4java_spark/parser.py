"""Query-string parser — the Quickwit mini-language (SURVEY.md §2.2 Q16).

Reference behavior: SplitSearcher.parseQuery (split/SplitSearcher.java:201-254)
-> quickwit_query::query_ast_from_user_text
(native/src/split_query/parse_query.rs:14-130).  Supported syntax:

  field:value            bare terms over default fields (all indexed text)
  a AND b, a OR b, NOT a, parentheses
  +must -must_not        occur prefixes
  "quoted phrase"~slop
  field:[a TO b]  field:{a TO b}   inclusive/exclusive ranges, * = unbounded
  field:pre* , *wild?card*         glob patterns -> Wildcard
  field:/regex/                    -> Regex
  field:*                          -> Exists
  *                                -> MatchAll
  term~  term~2                    fuzzy (distance default 1)

Normalizations (native/src/split_query/query_converters.rs:113-126): implicit
whitespace combination is OR (pure-SHOULD gets minimum_should_match=1 via
queries.normalize).  AND binds tighter than OR.

Lenient mode returns (query, warnings) instead of raising
(native/src/index.rs:527).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, Tuple

from tantivy4java_spark import queries as Q

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<range>[\[{][^\]}]*?\sTO\s[^\]}]*?[\]}])
  | (?P<phrase>"(?:[^"\\]|\\.)*"(?:~\d+)?)
  | (?P<regexv>/(?:[^/\\]|\\.)+/i?)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<colon>:)
  | (?P<term>[^\s():"]+)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "TO"}


@dataclass
class _Tok:
    kind: str
    text: str


def _lex(s: str) -> List[_Tok]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"cannot lex query at offset {i}: {s[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(_Tok(kind, m.group()))
    return out


_ISO_DT_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}"
    r"([T ]\d{2}:\d{2}:\d{2}(\.\d{1,6})?(Z|[+-]\d{2}:?\d{2})?)?$")


def parse_iso_datetime(s: str):
    """ISO-8601 date/datetime -> naive-UTC datetime (microsecond precision,
    matching the reference's DATE fields — DateMicrosecondPrecisionTest).
    Returns None when `s` is not ISO-shaped."""
    from datetime import datetime, timezone
    if not _ISO_DT_RE.match(s):
        return None
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _coerce(v: str):
    """Type a range bound: int, float, ISO datetime, else string
    (query/Query.java:280-297 type-aware bound parsing).  The searcher
    re-coerces against the actual column dtype at lowering, so a
    date-shaped bound on a string field still raw-matches."""
    if v == "*":
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    dt = parse_iso_datetime(v)
    if dt is not None:
        return dt
    return v


class _Parser:
    def __init__(self, tokens: List[_Tok], default_fields: List[str],
                 lenient: bool = False):
        self.toks = tokens
        self.i = 0
        self.default_fields = default_fields
        self.lenient = lenient
        self.warnings: List[str] = []

    def peek(self) -> Optional[_Tok]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    # query := or_seq ; implicit whitespace == OR
    def parse(self) -> Q.Query:
        q = self.parse_or()
        if self.peek() is not None:
            msg = f"unexpected token {self.peek().text!r}"
            if self.lenient:
                self.warnings.append(msg)
            else:
                raise ValueError(msg)
        return Q.normalize(q)

    def parse_or(self) -> Q.Query:
        items: List[Tuple[str, Q.Query]] = [self.parse_and()]
        while True:
            t = self.peek()
            if t is None or t.kind == "rparen":
                break
            if t.kind == "term" and t.text == "OR":
                self.next()
                items.append(self.parse_and())
            else:
                items.append(self.parse_and())  # implicit OR
        if len(items) == 1 and items[0][0] == "should":
            return items[0][1]
        must = tuple(q for occ, q in items if occ == "must")
        must_not = tuple(q for occ, q in items if occ == "must_not")
        should = tuple(q for occ, q in items if occ == "should")
        return Q.Boolean(must=must, should=should, must_not=must_not)

    def parse_and(self) -> Tuple[str, Q.Query]:
        occ, first = self.parse_unary()
        items = [(occ, first)]
        while True:
            t = self.peek()
            if t is not None and t.kind == "term" and t.text == "AND":
                self.next()
                items.append(self.parse_unary())
            else:
                break
        if len(items) == 1:
            return items[0]
        must = [q for o, q in items if o != "must_not"]
        must_not = [q for o, q in items if o == "must_not"]
        return ("should", Q.Boolean(must=must, must_not=must_not))

    def parse_unary(self) -> Tuple[str, Q.Query]:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        if t.kind == "term" and t.text == "NOT":
            self.next()
            _, q = self.parse_unary()
            return ("must_not", q)
        if t.kind == "plus":
            self.next()
            _, q = self.parse_unary()
            return ("must", q)
        if t.kind == "minus":
            self.next()
            _, q = self.parse_unary()
            return ("must_not", q)
        return ("should", self.parse_primary())

    def parse_primary(self) -> Q.Query:
        t = self.next()
        if t.kind == "lparen":
            q = self.parse_or()
            if self.peek() is None or self.peek().kind != "rparen":
                msg = "missing closing paren"
                if self.lenient:
                    self.warnings.append(msg)
                else:
                    raise ValueError(msg)
            else:
                self.next()
            return q
        if t.kind == "phrase":
            return self._phrase(None, t.text)
        if t.kind == "range":
            raise ValueError("range requires a field prefix: field:[a TO b]")
        if t.kind == "regexv":
            raise ValueError("regex requires a field prefix: field:/re/")
        if t.kind == "term":
            # field-scoped?
            nxt = self.peek()
            if nxt is not None and nxt.kind == "colon":
                self.next()  # consume ':'
                field = t.text
                return self._field_value(field)
            return self._bare(t.text)
        raise ValueError(f"unexpected token {t.text!r}")

    def _field_value(self, field: str) -> Q.Query:
        t = self.peek()
        if t is None:
            raise ValueError(f"missing value after '{field}:'")
        if t.kind == "lparen":
            # field:(a OR b) — distribute the field over the group
            self.next()
            sub = _Parser(self._collect_group(), [field], self.lenient)
            q = sub.parse()
            self.warnings.extend(sub.warnings)
            return q
        t = self.next()
        if t.kind == "phrase":
            return self._phrase(field, t.text)
        if t.kind == "range":
            return self._range(field, t.text)
        if t.kind == "regexv":
            # `/pattern/i` = case-insensitive flag (reference accepts it,
            # RegexQuerySplitTest.java:107); lowered as an inline (?i) group
            if t.text.endswith("/i"):
                return Q.Regex(field, "(?i)" + t.text[1:-2])
            return Q.Regex(field, t.text[1:-1])
        if t.kind == "term":
            return self._term_like(field, t.text)
        raise ValueError(f"bad value for field {field}: {t.text!r}")

    def _collect_group(self) -> List[_Tok]:
        depth, out = 1, []
        while True:
            t = self.peek()
            if t is None:
                if self.lenient:
                    self.warnings.append("missing closing paren")
                    return out
                raise ValueError("missing closing paren")
            self.next()
            if t.kind == "lparen":
                depth += 1
            elif t.kind == "rparen":
                depth -= 1
                if depth == 0:
                    return out
            out.append(t)

    def _phrase(self, field: Optional[str], text: str) -> Q.Query:
        slop = 0
        if "~" in text and text.rsplit("~", 1)[1].isdigit():
            text, s = text.rsplit("~", 1)
            slop = int(s)
        words = text.strip('"').replace('\\"', '"').split()
        fields = [field] if field else self.default_fields
        qs = [Q.Phrase(f, words, slop) for f in fields]
        return qs[0] if len(qs) == 1 else Q.Boolean(should=qs)

    def _range(self, field: str, text: str) -> Q.Query:
        incl_lo = text[0] == "["
        incl_hi = text[-1] == "]"
        inner = text[1:-1]
        lo_s, hi_s = re.split(r"\sTO\s", inner, maxsplit=1)
        lo, hi = _coerce(lo_s.strip()), _coerce(hi_s.strip())
        return Q.Range(field, lo, hi, incl_lo, incl_hi)

    def _term_like(self, field: str, text: str) -> Q.Query:
        if text == "*":
            return Q.Exists(field)
        # fuzzy suffix: term~ or term~2
        m = re.fullmatch(r"(.+?)~(\d?)", text)
        if m:
            return Q.Fuzzy(field, m.group(1), int(m.group(2) or 1))
        if "*" in text or "?" in text:
            return Q.Wildcard(field, text)
        return Q.Term(field, _coerce_term(text))

    def _bare(self, text: str) -> Q.Query:
        if text == "*":
            return Q.MatchAll()
        qs = [self._term_like(f, text) for f in self.default_fields]
        if not qs:
            raise ValueError("no default fields for bare term")
        return qs[0] if len(qs) == 1 else Q.Boolean(should=qs)


def _coerce_term(v: str):
    if v.lower() in ("true", "false"):
        return v
    return v


def parse_query(s: str, default_fields: List[str]) -> Q.Query:
    """Strict parse -> AST (SplitSearcher.parseQuery analog)."""
    return _Parser(_lex(s), default_fields).parse()


def parse_query_lenient(s: str, default_fields: List[str]) -> Tuple[Q.Query, List[str]]:
    """Lenient parse -> (AST, warnings) (native/src/index.rs:527)."""
    p = _Parser(_lex(s), default_fields, lenient=True)
    try:
        q = p.parse()
    except ValueError as e:
        p.warnings.append(str(e))
        q = Q.MatchAll()
    return q, p.warnings
