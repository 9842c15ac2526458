"""Index schema config — the SchemaBuilder analog.

Reference: core/SchemaBuilder.java:60-414 builds a fixed schema with per-field
flags (stored / indexed / fast, tokenizer, index option basic|freq|position).
Here a schema is a plain declarative config over an existing DataFrame's
columns; the source table IS the document store (Parquet Companion mode,
docs/PARQUET_COMPANION_MODE_DESIGN.md:38-52 — store only the inverted index,
keep docs in the columnar table).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

from tantivy4java_spark.analysis import DEFAULT_TOKEN_LIMIT, parse_tokenizer_name

INDEX_BASIC = "basic"       # docIDs only
INDEX_FREQ = "freq"         # + term frequencies
INDEX_POSITION = "position"  # + token positions (needed for phrase queries)

_INDEX_OPTIONS = (INDEX_BASIC, INDEX_FREQ, INDEX_POSITION)


@dataclass(frozen=True)
class FieldConfig:
    """One indexed field.

    type 'text'   -> tokenized (reference addTextField, SchemaBuilder.java:60-103)
    type 'string' -> raw/keyword exact-match  (addStringField, :401-414)
    type 'i64'/'f64'/'bool'/'date' -> fast-field column, term+range queryable
    """

    name: str
    type: str = "text"
    tokenizer: str = "default"
    index_option: str = INDEX_POSITION
    fast: bool = False
    token_limit: int = DEFAULT_TOKEN_LIMIT

    def __post_init__(self):
        if self.index_option not in _INDEX_OPTIONS:
            raise ValueError(f"bad index option {self.index_option}")
        base, limit = parse_tokenizer_name(self.tokenizer)
        object.__setattr__(self, "tokenizer", base)
        if limit != DEFAULT_TOKEN_LIMIT:
            object.__setattr__(self, "token_limit", limit)
        if self.type == "string":
            object.__setattr__(self, "tokenizer", "raw")

    @property
    def tokenized(self) -> bool:
        return self.type == "text"

    @property
    def has_positions(self) -> bool:
        # json: per-dot-path token positions when the field has the position
        # option (reference README.md:111-179, JsonFieldQueryTest.java) —
        # enables phraseQuery over dot-paths
        return self.index_option == INDEX_POSITION \
            and self.type in ("text", "json")


@dataclass
class IndexConfig:
    """Schema for one index: which source columns are indexed and how.

    id_cols: columns identifying a source row (kept in the docs table for
    the content-sha256 linkage invariant).
    """

    fields: List[FieldConfig]
    id_cols: List[str] = dc_field(default_factory=list)
    content_col: Optional[str] = None  # column whose sha256 is the row invariant
    shard_bits: int = 16               # doc_id-range posting shard width (2^bits docs)
    block_size: int = 128

    def field(self, name: str) -> FieldConfig:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(f"field not in schema: {name}")

    @property
    def field_map(self) -> Dict[str, FieldConfig]:
        return {f.name: f for f in self.fields}

    @property
    def text_fields(self) -> List[FieldConfig]:
        return [f for f in self.fields if f.type in ("text", "string")]

    @property
    def default_search_fields(self) -> List[str]:
        """All indexed text fields (parse_query default —
        native/src/split_query/parse_query.rs:34-52)."""
        return [f.name for f in self.fields if f.type == "text"]


def code_corpus_config() -> IndexConfig:
    """The input_hint schema: (repo, path, commit, lang, content)."""
    return IndexConfig(
        fields=[
            FieldConfig("content", "text", "default", INDEX_POSITION),
            FieldConfig("repo", "string"),
            FieldConfig("path", "string"),
            FieldConfig("lang", "string"),
            FieldConfig("commit", "string"),
        ],
        id_cols=["repo", "path", "commit", "lang"],
        content_col="content",
    )


def documents_config() -> IndexConfig:
    """Schema for the driver's `documents` table (doc_id,text,lang,source,n_chars)."""
    return IndexConfig(
        fields=[
            FieldConfig("text", "text", "default", INDEX_POSITION),
            FieldConfig("lang", "string"),
            FieldConfig("source", "string"),
            FieldConfig("n_chars", "i64", fast=True),
        ],
        id_cols=["doc_id", "lang", "source", "n_chars"],
        content_col="text",
    )
