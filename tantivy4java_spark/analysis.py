"""Text analysis: the five reference tokenizers, vectorized.

Behavioral contract (reference: native/src/text_analyzer.rs:208-244):

| name       | pipeline                                                        |
|------------|-----------------------------------------------------------------|
| default    | SimpleTokenizer (split on non-alphanumeric) -> lowercase -> drop tokens longer than `limit` BYTES |
| simple     | identical to default                                            |
| whitespace | WhitespaceTokenizer -> lowercase -> drop-long                   |
| keyword    | RawTokenizer: whole input is one token, no filters              |
| raw        | identical to keyword                                            |

Notes:
- NO stopword removal (the reference README claims it; the code does not —
  text_analyzer.rs:210-216 wins, per SURVEY.md §1.3).
- Over-limit tokens are DROPPED, not truncated (text_analyzer.rs:12-18;
  core/TokenLength.java:20-60).  Default limit 255 bytes.
- Rust's SimpleTokenizer splits on `!char::is_alphanumeric` (Unicode).  The
  Python equivalent is the regex class `[^\\W_]` (\\w minus underscore); the
  JVM fast path uses `[\\p{L}\\p{Nd}]`.  Identical on all ASCII and common
  Unicode text; tests pin the golden behavior.
- Token *positions* are the ordinal in the emitted token stream; the
  RemoveLongFilter drops a token without closing the position gap, so
  positions are assigned BEFORE the length filter (tantivy assigns
  Token.position in the tokenizer, filters only skip tokens).

Two execution paths, asserted equivalent in tests:
- `tokenize_udf(...)`: pandas UDF (Arrow-vectorized), the reference-faithful
  golden path.
- `sql_tokenize_expr(...)`: pure Catalyst expression (split/lower), the fast
  JVM path for index builds — whole-stage-codegen, no Python in the loop.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Tuple

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_TOKEN_LIMIT = 255  # bytes (Quickwit-compatible; core/TokenLength.java:32)
MAX_TOKEN_LIMIT = 65530

# \w minus underscore == Unicode alphanumeric (Rust char::is_alphanumeric analog)
_SIMPLE_RE = re.compile(r"[^\W_]+", re.UNICODE)
_WS_RE = re.compile(r"\S+", re.UNICODE)

TOKENIZERS = ("default", "simple", "whitespace", "keyword", "raw")

# -- custom tokenizer registry (registerTokenizer analog, index.rs:541) ------
# A custom tokenizer is DECLARATIVE: a token match-regex (Python syntax), an
# equivalent split-regex (Java syntax, for the pure-Catalyst path), and a
# lowercase flag.  Declarative definitions keep both execution paths
# (pandas golden / JVM codegen) available and bit-identical.
_CUSTOM: dict = {}


def register_tokenizer(name: str, match_pattern: str,
                       split_pattern: str = None,
                       lowercase: bool = True) -> None:
    """Register a custom tokenizer usable as FieldConfig(tokenizer=name).

    match_pattern: Python regex matching each TOKEN (findall semantics).
    split_pattern: Java regex of the DELIMITER runs (for F.split on the JVM
      fast path); omit to force the pandas path for fields using this name.
    lowercase: apply the lowercase filter after tokenization (default true,
      like the built-in analyzers).
    """
    if name in TOKENIZERS:
        raise ValueError(f"cannot override built-in tokenizer: {name}")
    re.compile(match_pattern)  # fail fast on a bad pattern
    _CUSTOM[name] = {"match": match_pattern, "split": split_pattern,
                     "lowercase": bool(lowercase)}


def custom_tokenizer(name: str) -> dict:
    return _CUSTOM.get(name)


def parse_tokenizer_name(name: str) -> Tuple[str, int]:
    """Parse ``default-64`` style names (reference: native/src/index.rs:397-490)."""
    base, sep, limit = name.partition("-")
    if sep and limit.isdigit():
        lim = int(limit)
        if not (1 <= lim <= MAX_TOKEN_LIMIT):
            raise ValueError(f"token limit out of range: {name}")
        return base, lim
    return name, DEFAULT_TOKEN_LIMIT


def tokenize_text(text: str, tokenizer: str = "default",
                  limit: int = DEFAULT_TOKEN_LIMIT) -> List[Tuple[str, int]]:
    """Tokenize one string -> [(term, position)].  Pure-Python golden impl."""
    if text is None:
        return []
    if tokenizer in ("keyword", "raw"):
        return [(text, 0)] if text != "" else []
    lower = True
    if tokenizer in ("default", "simple"):
        raw = _SIMPLE_RE.findall(text)
    elif tokenizer == "whitespace":
        raw = _WS_RE.findall(text)
    elif tokenizer in _CUSTOM:
        cfg = _CUSTOM[tokenizer]
        raw = re.findall(cfg["match"], text)
        lower = cfg["lowercase"]
    else:
        raise ValueError(f"unknown tokenizer: {tokenizer}")
    out = []
    for pos, tok in enumerate(raw):
        if lower:
            tok = tok.lower()
        if len(tok.encode("utf-8")) > limit:
            continue  # dropped, not truncated
        out.append((tok, pos))
    return out


def tokenize_series(texts: pd.Series, tokenizer: str = "default",
                    limit: int = DEFAULT_TOKEN_LIMIT) -> pd.Series:
    """Vectorized: Series[str] -> Series[list[(term, pos)]]."""
    if tokenizer in ("keyword", "raw"):
        return texts.map(lambda t: [(t, 0)] if t else [])
    lower = True
    if tokenizer in ("default", "simple"):
        rex = _SIMPLE_RE
    elif tokenizer == "whitespace":
        rex = _WS_RE
    elif tokenizer in _CUSTOM:
        rex = re.compile(_CUSTOM[tokenizer]["match"])
        lower = _CUSTOM[tokenizer]["lowercase"]
    else:
        raise ValueError(f"unknown tokenizer: {tokenizer}")

    def one(t):
        if t is None:
            return []
        out = []
        for pos, tok in enumerate(rex.findall(t)):
            if lower:
                tok = tok.lower()
            if len(tok.encode("utf-8")) > limit:
                continue
            out.append((tok, pos))
        return out

    return texts.map(one)


_TOKENS_SCHEMA = T.ArrayType(
    T.StructType([
        T.StructField("term", T.StringType()),
        T.StructField("pos", T.IntegerType()),
    ])
)


def tokenize_udf(tokenizer: str = "default", limit: int = DEFAULT_TOKEN_LIMIT):
    """Arrow-vectorized pandas UDF: string column -> array<struct<term,pos>>.

    The tokenizer definition (including a registered custom one) is resolved
    DRIVER-SIDE here and captured in the closure as plain strings — the
    registry itself does not exist on executors."""
    if tokenizer in ("keyword", "raw"):
        @F.pandas_udf(_TOKENS_SCHEMA)
        def _raw(texts: pd.Series) -> pd.Series:
            return texts.map(lambda t: [(t, 0)] if t else [])
        return _raw
    lower = True
    if tokenizer in ("default", "simple"):
        pattern = _SIMPLE_RE.pattern
    elif tokenizer == "whitespace":
        pattern = _WS_RE.pattern
    elif tokenizer in _CUSTOM:
        pattern = _CUSTOM[tokenizer]["match"]
        lower = _CUSTOM[tokenizer]["lowercase"]
    else:
        raise ValueError(f"unknown tokenizer: {tokenizer}")

    @F.pandas_udf(_TOKENS_SCHEMA)
    def _tok(texts: pd.Series) -> pd.Series:
        rex = re.compile(pattern)

        def one(t):
            if t is None:
                return []
            out = []
            for pos, tok in enumerate(rex.findall(t)):
                if lower:
                    tok = tok.lower()
                if len(tok.encode("utf-8")) > limit:
                    continue
                out.append((tok, pos))
            return out

        return texts.map(one)

    return _tok


def sql_tokenize_expr(col: Column, tokenizer: str = "default",
                      limit: int = DEFAULT_TOKEN_LIMIT) -> Column:
    """JVM-side tokenization -> array<struct<term,pos>> (same contract).

    Stays inside whole-stage codegen: regexp split + posexplode-able array.
    Position gaps from dropped over-limit tokens are preserved by filtering
    AFTER position assignment, matching the pandas path bit-for-bit.
    """
    lower = True
    if tokenizer in ("default", "simple"):
        # split on runs of non-alphanumeric; lowercase each surviving token
        arr = F.split(col, r"[^\p{L}\p{Nd}]+")
    elif tokenizer == "whitespace":
        arr = F.split(col, r"\s+")
    elif tokenizer in ("keyword", "raw"):
        return F.when(
            col.isNotNull() & (col != F.lit("")),
            F.array(F.struct(col.alias("term"), F.lit(0).alias("pos"))),
        ).otherwise(F.array().cast(_TOKENS_SCHEMA))
    elif tokenizer in _CUSTOM and _CUSTOM[tokenizer]["split"]:
        arr = F.split(col, _CUSTOM[tokenizer]["split"])
        lower = _CUSTOM[tokenizer]["lowercase"]
    elif tokenizer in _CUSTOM:
        raise ValueError(
            f"custom tokenizer {tokenizer!r} has no split_pattern; build "
            f"with use_sql_tokenizer=False for fields using it")
    else:
        raise ValueError(f"unknown tokenizer: {tokenizer}")

    # split() yields "" fragments at the boundaries; enumerate first (so
    # positions match the golden path where findall skips empties) requires
    # filtering empties BEFORE position assignment.
    arr = F.filter(arr, lambda t: t != F.lit(""))
    term_of = (lambda t: F.lower(t)) if lower else (lambda t: t)
    with_pos = F.transform(
        arr, lambda t, i: F.struct(term_of(t).alias("term"), i.cast("int").alias("pos"))
    )
    # drop-long AFTER positions are assigned (position gaps preserved)
    filtered = F.filter(with_pos, lambda s: F.octet_length(s["term"]) <= F.lit(limit))
    return F.coalesce(filtered, F.array().cast(_TOKENS_SCHEMA))  # null text -> []
