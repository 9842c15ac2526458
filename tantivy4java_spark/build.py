"""Index build: segments -> hierarchical merge -> global index tables.

Mirrors the reference's build lifecycle (SURVEY.md §3.3) Spark-first:

  reference                                  here
  ---------------------------------------   ----------------------------------
  IndexWriter N threads -> N segments        N doc-range segments, each a Spark
  (native/src/index.rs:177)                  job writing independent Parquet
  writer.commit() -> opstamp                 manifest "add" line per segment
  QuickwitSplit.convertIndex + mergeSplits   merge job: re-block postings per
  (native/src/quickwit_split/merge_impl.rs)  (field,term,shard), global stats
  txlog Add actions w/ stats                 _manifest/<n>.json versioned
  (native/src/txlog/actions.rs:182-241)      actions enabling zero-recompute
                                             resume and lock-free appends

Physical layout under ``index_dir``:
  docs/        doc_id, <id_cols>, content_sha256, len_<f>, norm_<f>
  segments/seg=NNNNN/postings/   field, term, shard, block_id, first_doc,
               last_doc, count, docs_bin, tfs_bin, norms_bin, max_tf,
               min_norm_id, block_max_score — payloads stay here after the
               METADATA-ONLY merge (stats.json lists the dirs); segment doc
               ranges are disjoint and files are clustered by
               (field, term, shard, doc_id), so the union is the merged
               doc-ordered stream
  blockmeta/   field, term, shard, first_doc, count, block_max_score —
               decode-free per-block WAND bounds computed at merge from
               (max_tf, min_norm_id) + global idf/avgdl
  positions/   field, term, doc_id, positions array<int> (per-segment dirs,
               listed in stats)
  terms/       field, term, df, total_tf (range-sharded, sorted)
  stats.json   per-field num_docs / total_tokens / avgdl (+ global num_docs,
               postings_dirs, positions_dirs)
  _manifest/<n>.json   one versioned action file per commit (txlog shape;
               legacy single manifest.jsonl indexes stay readable)

Scale notes (the design target is ~10^12 files on a multi-executor cluster):
- posting shards are doc_id ranges (``doc_id >> shard_bits``): skewed terms
  ("import", "return") split across shards, every groupBy key is bounded by
  the shard width -> no hot reducer; shards are doc-ordered so merged posting
  lists are concatenations, never re-sorts.
- segments are doc-range slices committed independently -> an interrupted
  build resumes from the manifest without recomputing finished segments.
- the only shuffles are (a) ONE repartition by (_seg,field,term,shard)
  across all segments of a batch build and (b) the same key at merge; both
  scale horizontally with executors.
- tokenization defaults to the pure-Catalyst expression (whole-stage codegen,
  zero Python); the pandas-UDF path is kept for golden parity tests.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tantivy4java_spark import codec
from tantivy4java_spark import fsio
from tantivy4java_spark.analysis import sql_tokenize_expr, tokenize_udf
from tantivy4java_spark.fieldnorm import fieldnorm_to_id
from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.scoring import B, K1

_POSTINGS_SCHEMA = T.StructType([
    T.StructField("field", T.StringType()),
    T.StructField("term", T.StringType()),
    T.StructField("shard", T.LongType()),
    T.StructField("block_id", T.LongType()),
    T.StructField("first_doc", T.LongType()),
    T.StructField("last_doc", T.LongType()),
    T.StructField("count", T.LongType()),
    T.StructField("docs_bin", T.BinaryType()),
    T.StructField("tfs_bin", T.BinaryType()),
    T.StructField("norms_bin", T.BinaryType()),
    T.StructField("max_tf", T.LongType()),
    T.StructField("min_norm_id", T.LongType()),
    T.StructField("block_max_score", T.DoubleType()),
])


def assign_doc_ids(df: DataFrame, order_cols: Optional[List[str]] = None,
                   doc_id_col: Optional[str] = None) -> DataFrame:
    """Deterministic doc_id assignment.

    - ``doc_id_col``: pass through an existing unique integer column.
    - ``order_cols``: global sort + row_number (exact, used at test scale and
      for golden rank-identity; one shuffle).
    - neither: scalable two-pass zipWithIndex — per-partition counts collected
      (tiny), then offset + local ordinal inside mapInPandas.  Deterministic
      for a fixed input file layout (doc_id = file-order position), which is
      the 10^12-scale mode.
    """
    if doc_id_col:
        return df.withColumn("doc_id", F.col(doc_id_col).cast("long"))
    if order_cols:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)
    return _zip_index_ids(df)[0]


def _zip_index_ids(df: DataFrame):
    """zipWithIndex doc_ids; returns (df_with_ids, total_rows).  The total
    falls out of the per-partition counts — callers that need it (segment
    width derivation) skip a second full pass over the input."""
    part_counts = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").count().collect()
    )
    counts = {r["_pid"]: r["count"] for r in part_counts}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    schema = T.StructType(df.schema.fields + [T.StructField("doc_id", T.LongType())])
    b_offsets = offsets

    def add_ids(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in it:
            pdf = pdf.copy()
            pdf["doc_id"] = np.arange(seen, seen + len(pdf), dtype=np.int64) + b_offsets.get(pid, 0)
            seen += len(pdf)
            yield pdf

    return df.mapInPandas(add_ids, schema), acc


def _norm_id_udf():
    @F.pandas_udf(T.IntegerType())
    def _norm(lengths: pd.Series) -> pd.Series:
        return pd.Series(fieldnorm_to_id(lengths.fillna(0).to_numpy()).astype(np.int32))
    return _norm


def _norm_id_expr(len_col):
    """Pure-JVM fieldnorm quantization: the 256-entry table is strictly
    increasing, so id == count(entries <= len) - 1 (len >= 0 always holds
    for token counts).  Bit-identical to fieldnorm_to_id / the pandas UDF
    (pinned by tests); removes the ArrowEvalPython stage from the docs
    frame of every build (guide SS4.1: built-ins over UDFs)."""
    from tantivy4java_spark.fieldnorm import FIELDNORM_TABLE
    arr = F.lit([int(v) for v in FIELDNORM_TABLE])
    ln = F.coalesce(len_col, F.lit(0))
    return (F.size(F.filter(arr, lambda v: v <= ln)) - F.lit(1)).cast("int")


_PDT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("field", T.StringType()),
    T.StructField("term", T.StringType()),
    T.StructField("tf", T.LongType()),
    T.StructField("norm_id", T.LongType()),
    T.StructField("pos_bin", T.BinaryType()),
])

_TOK_REGEX = {"default": r"[^\W_]+", "simple": r"[^\W_]+", "whitespace": r"\S+"}

JSON_PATH_SEP = "\x00"  # term key = "<dot.path>\x00<token>" (Q11 analog)


def _json_agg_fn(field: str, tokenizer: str, limit: int):
    """mapInPandas for JSON fields: schema-less dot-path flattening
    (reference: core/JsonObjectOptions.java, README.md:111-179).

    Each (path, value) pair becomes terms "<path>\\x00<token>": strings run
    through the field tokenizer, numbers/bools become exact tokens.  Token
    POSITIONS are tracked per dot-path (JsonFieldQueryTest.java: phrase
    queries inside json fields): tokens of one string value are consecutive;
    separate values under the same path (array elements, repeated keys)
    advance by 2 — the same gap the multi-value text convention uses, so a
    phrase can never match across a value boundary at slop 0.  JSON
    parsing is per-row (stdlib C json) — documented as the one per-row step;
    everything downstream is vectorized.
    """
    import json as _json
    import re as _re
    rex = _re.compile(_TOK_REGEX.get(tokenizer, _TOK_REGEX["default"]))

    def flatten(prefix, obj, out):
        """Append (path, [tokens-of-one-value]) groups in document order."""
        if isinstance(obj, dict):
            for k, v in obj.items():
                flatten(f"{prefix}.{k}" if prefix else str(k), v, out)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                flatten(prefix, v, out)
        elif isinstance(obj, bool):
            out.append((prefix, ["true" if obj else "false"]))
        elif isinstance(obj, (int, float)):
            out.append((prefix, [_json_num_token(obj)]))
        elif obj is None:
            pass
        else:
            toks = [t.lower() for t in rex.findall(str(obj))
                    if len(t.lower().encode("utf-8")) <= limit]
            if toks:
                out.append((prefix, toks))

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "field": [], "term": [], "tf": [],
                    "norm_id": [], "pos_bin": []}
            for did, raw in zip(pdf["doc_id"].to_numpy(dtype=np.int64),
                                pdf[field]):
                if raw is None:
                    continue
                try:
                    obj = raw if isinstance(raw, dict) else _json.loads(raw)
                except (ValueError, TypeError):
                    continue
                groups: list = []
                flatten("", obj, groups)
                if not groups:
                    continue
                pos_map: dict = {}   # term -> [positions]
                counters: dict = {}  # path -> next position
                ntok = 0
                for p, toks in groups:
                    start = counters.get(p, 0)
                    for j, t in enumerate(toks):
                        pos_map.setdefault(
                            f"{p}{JSON_PATH_SEP}{t}", []).append(start + j)
                    counters[p] = start + len(toks) + 1  # +2 value gap
                    ntok += len(toks)
                norm = int(fieldnorm_to_id([ntok])[0])
                for term, plist in pos_map.items():
                    rows["doc_id"].append(int(did))
                    rows["field"].append(field)
                    rows["term"].append(term)
                    rows["tf"].append(len(plist))
                    rows["norm_id"].append(norm)
                    rows["pos_bin"].append(codec.encode_positions(
                        np.asarray(plist, dtype=np.int64)))
            yield pd.DataFrame(rows).astype(
                {"doc_id": "int64", "tf": "int64", "norm_id": "int64"})

    return run


def json_query_token(value) -> str:
    """Typed query value -> the token the JSON indexer produced."""
    toks = json_query_tokens(value)
    return toks[0] if toks else ""


def json_query_tokens(value) -> list:
    """Typed query value -> ALL tokens the JSON indexer produced for it.
    A multi-token string value ('user_0' -> ['user', '0']) must match as an
    intersection under the path, mirroring the reference parser's full-text
    lowering of json term values."""
    if isinstance(value, bool):
        return ["true" if value else "false"]
    if isinstance(value, (int, float)):
        return [_json_num_token(value)]
    from tantivy4java_spark.analysis import tokenize_text
    return [t for t, _ in tokenize_text(str(value), "default")]


def _json_num_token(v) -> str:
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _tokenize_agg_fn(field: str, tokenizer: str, limit: int):
    """mapInArrow: (doc_id, <field>) -> per-(doc, term) rows with tf,
    fieldnorm id, and delta-varint positions — all inside ONE narrow pass.

    Replaces explode -> shuffle -> groupBy(doc,term) -> collect_list: token
    aggregation is per-document, so it never needs a shuffle.  C-level regex
    via pandas .str, numpy factorize/sort for grouping; output batches are
    assembled as Arrow arrays directly — the pos_bin column reuses the one
    varint buffer zero-copy via group offsets (groups are contiguous in the
    sorted slot order), so no per-group Python byte slicing and no pandas
    frame on the way out.  Token semantics match analysis.py bit-for-bit
    (positions assigned pre-drop, >limit-byte tokens dropped)."""
    lowercase = True
    if tokenizer in _TOK_REGEX:
        rex = _TOK_REGEX[tokenizer]
    else:
        from tantivy4java_spark.analysis import custom_tokenizer
        cfg_c = custom_tokenizer(tokenizer)
        if cfg_c is None:
            raise ValueError(f"unknown tokenizer: {tokenizer}")
        rex, lowercase = cfg_c["match"], cfg_c["lowercase"]

    # Arrow-native tokenize fast path: valid for the default/simple
    # tokenizer on PURE-ASCII batches, where Python's [^\W_]+ and RE2's
    # [^0-9A-Za-z]+ splitter agree character-for-character (checked per
    # batch via chars == bytes, one C++ metadata pass).  Tokens then never
    # materialize as Python strings: RE2 split + dictionary_encode give
    # int32 codes + a small uniques dictionary directly.
    arrow_ok = tokenizer in ("default", "simple")

    def run(it):
        import pyarrow as pa
        import pyarrow.compute as pc
        for rb in it:
            if rb.num_rows == 0:
                continue
            n_rows = rb.num_rows
            names = rb.schema.names
            col = rb.column(names.index(field))
            doc_ids = rb.column(names.index("doc_id")) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            is_ascii = False
            if arrow_ok:
                nb = pc.sum(pc.binary_length(col)).as_py() or 0
                nc = pc.sum(pc.utf8_length(col)).as_py() or 0
                is_ascii = nb == nc
            if is_ascii:
                tl = pc.split_pattern_regex(
                    pc.fill_null(col, ""), "[^0-9A-Za-z]+")
                tl = tl.combine_chunks() if isinstance(tl, pa.ChunkedArray) else tl
                sizes = np.diff(tl.offsets.to_numpy(zero_copy_only=False))
                vals = tl.values
                # split keeps "" at value boundaries; findall drops them
                mask = pc.not_equal(vals, "")
                mask_np = mask.to_numpy(zero_copy_only=False)
                doc_rep = np.repeat(np.arange(n_rows), sizes)[mask_np]
                counts = np.bincount(doc_rep, minlength=n_rows)
                total = int(doc_rep.size)
                if total == 0:
                    continue
                offsets = np.zeros(n_rows, dtype=np.int64)
                np.cumsum(counts[:-1], out=offsets[1:])
                pos = np.arange(total, dtype=np.int64) - offsets[doc_rep]
                d = pc.dictionary_encode(pc.filter(vals, mask))
                codes = d.indices.to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                uniques = d.dictionary.to_numpy(zero_copy_only=False)
            else:
                texts = col.to_pandas().fillna("").astype(str)
                token_lists = texts.str.findall(rex)
                counts = token_lists.str.len().to_numpy(dtype=np.int64)
                total = int(counts.sum())
                if total == 0:
                    continue
                flat = np.concatenate(
                    [np.asarray(x, dtype=object) for x in token_lists])
                doc_rep = np.repeat(np.arange(n_rows), counts)
                offsets = np.zeros(n_rows, dtype=np.int64)
                np.cumsum(counts[:-1], out=offsets[1:])
                pos = np.arange(total, dtype=np.int64) - offsets[doc_rep]
                # factorize FIRST: lowercase + the byte-length filter then
                # touch only DISTINCT tokens (was: two full .str passes over
                # every token instance — the hottest part of the kernel)
                codes, uniques = pd.factorize(flat)
            uniq = pd.Series(uniques)
            if lowercase:
                # merge case variants: first-appearance code order is
                # preserved by composition, so codes match the old
                # factorize-after-lower numbering exactly
                lcodes, luniq = pd.factorize(uniq.str.lower().to_numpy())
                codes = lcodes[codes]
                uniq = pd.Series(luniq)
            uniques = uniq.to_numpy()
            # drop tokens > limit BYTES (positions keep their gaps)
            char_len = uniq.str.len().to_numpy()
            keep_u = char_len * 4 <= limit  # utf8 len <= 4*chars -> kept
            maybe = ~keep_u & (char_len <= limit)  # needs exact byte check
            if maybe.any():
                enc = uniq[maybe].str.encode("utf-8").str.len().to_numpy()
                keep_u[np.nonzero(maybe)[0][enc <= limit]] = True
            if not keep_u.all():
                keep = keep_u[codes]
                codes, doc_rep, pos = codes[keep], doc_rep[keep], pos[keep]
                kept_counts = np.bincount(doc_rep, minlength=n_rows)
            else:
                kept_counts = counts
            norms = fieldnorm_to_id(kept_counts)
            # positions ascend within every (doc, code) group already, so a
            # STABLE single-key sort equals the old lexsort((pos, codes,
            # doc_rep)) at ~half the cost
            order = np.argsort(doc_rep * np.int64(len(uniques)) + codes,
                               kind="stable")
            sd, sc, sp = doc_rep[order], codes[order], pos[order]
            change = np.ones(sd.size, dtype=bool)
            change[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
            gstart = np.nonzero(change)[0]
            gend = np.append(gstart[1:], sd.size)
            tf = (gend - gstart).astype(np.int64)
            # delta-varint positions with resets at group starts
            gaps = np.empty(sd.size, dtype=np.uint64)
            gaps[1:] = (sp[1:] - sp[:-1]).astype(np.uint64)
            gaps[gstart] = sp[gstart].astype(np.uint64)
            pbuf, plens = codec.varint_encode_with_lengths(gaps)
            poffs = np.zeros(sd.size + 1, dtype=np.int64)
            np.cumsum(plens, out=poffs[1:])
            # groups are contiguous in slot order, so the per-group byte
            # ranges tile pbuf: one offsets gather makes the binary column
            # ZERO-COPY over the single varint buffer
            out_n = gstart.size
            bin_offs = poffs[np.append(gstart, sd.size)].astype(np.int32)
            pos_bin = pa.Array.from_buffers(
                pa.binary(), out_n,
                [None, pa.py_buffer(bin_offs.tobytes()),
                 pa.py_buffer(pbuf)])
            term_arr = pa.DictionaryArray.from_arrays(
                pa.array(sc[gstart].astype(np.int32)),
                pa.array(uniques)).cast(pa.string())
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids[sd[gstart]], type=pa.int64()),
                 pa.array([field] * out_n, type=pa.string()),
                 term_arr,
                 pa.array(tf, type=pa.int64()),
                 pa.array(norms[sd[gstart]].astype(np.int64),
                          type=pa.int64()),
                 pos_bin],
                names=["doc_id", "field", "term", "tf", "norm_id",
                       "pos_bin"])

    return run


def _group_change(pdf: pd.DataFrame, with_seg: bool = False) -> np.ndarray:
    """First-row-of-([seg,]field,term,shard)-group marker over a sorted
    frame.  ``with_seg`` adds the batched-build ``_seg`` column to the key
    (segment doc ranges are disjoint, so within one segment the key is
    equivalent to (field,term,shard))."""
    n = len(pdf)
    f = pdf["field"].to_numpy()
    t = pdf["term"].to_numpy()
    sh = pdf["shard"].to_numpy()
    change = np.ones(n, dtype=bool)
    if n > 1:
        change[1:] = (f[1:] != f[:-1]) | (t[1:] != t[:-1]) | (sh[1:] != sh[:-1])
        if with_seg:
            sg = pdf["_seg"].to_numpy()
            change[1:] |= sg[1:] != sg[:-1]
    return change


def _blocks_frame(pdf: pd.DataFrame, blocks: dict,
                  with_seg: bool = False) -> pd.DataFrame:
    ri = blocks["row_index"]
    out = {}
    if with_seg:
        out["_seg"] = pdf["_seg"].to_numpy()[ri].astype(np.int64)
    out.update({
        "field": pdf["field"].to_numpy()[ri],
        "term": pdf["term"].to_numpy()[ri],
        "shard": pdf["shard"].to_numpy()[ri].astype(np.int64),
        "block_id": blocks["block_id"],
        "first_doc": blocks["first_doc"],
        "last_doc": blocks["last_doc"],
        "count": blocks["count"].astype(np.int64),
        "docs_bin": blocks["docs_bin"],
        "tfs_bin": blocks["tfs_bin"],
        "norms_bin": blocks["norms_bin"],
        "max_tf": blocks["max_tf"],
        "min_norm_id": blocks["min_norm_id"],
        "block_max_score": blocks["block_max_score"],
    })
    return pd.DataFrame(out)


def _encode_blocks_fn(block_size: int, with_scores: bool,
                      norm_decode=None, avgdl_map=None,
                      with_seg: bool = False):
    """mapInPandas: ([_seg,]field,term,shard,doc_id,tf,norm_id[,idf_w]) ->
    block rows.

    Input partitions sorted by ([_seg,]field,term,shard,doc_id); fully
    vectorized — the only per-block Python is byte-buffer slicing (codec
    segmented path).
    """

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            docs = pdf["doc_id"].to_numpy(dtype=np.int64)
            tfs = pdf["tf"].to_numpy(dtype=np.int64)
            norms = pdf["norm_id"].to_numpy(dtype=np.int64)
            scores = None
            if with_scores:
                idf_w = pdf["idf_w"].to_numpy(dtype=np.float64)
                avgdl = pdf["field"].map(avgdl_map).to_numpy(dtype=np.float64)
                lens = norm_decode[norms].astype(np.float64)
                scores = idf_w * tfs / (tfs + K1 * (1.0 - B + B * lens / avgdl))
            blocks = codec.encode_blocks_segmented(
                _group_change(pdf, with_seg), docs, tfs, norms, block_size,
                scores)
            yield _blocks_frame(pdf, blocks, with_seg)

    return encode


def _reblock_fn(block_size: int):
    """Intermediate-level merge: decode + concat + re-block postings without
    scoring (global idf/avgdl are only known at the final level)."""

    def merge(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            counts = pdf["count"].to_numpy(dtype=np.int64)
            vals = codec.decode_blocks_concat(
                pdf["first_doc"].to_numpy(dtype=np.int64), counts,
                list(pdf["docs_bin"]), list(pdf["tfs_bin"]),
                list(pdf["norms_bin"]))
            bov = vals["block_of_value"]
            vpdf = pd.DataFrame({
                "field": pdf["field"].to_numpy()[bov],
                "term": pdf["term"].to_numpy()[bov],
                "shard": pdf["shard"].to_numpy()[bov],
            })
            blocks = codec.encode_blocks_segmented(
                _group_change(vpdf), vals["doc_id"], vals["tf"],
                vals["norm_id"], block_size, None)
            yield _blocks_frame(vpdf, blocks)

    return merge


def active_segments(actions: List[dict]) -> List[int]:
    """Effective (non-rolled-back) segment adds, in manifest order.

    A ``rollback`` action removes the segments it names from the active set
    (IndexWriter.rollback analog — uncommitted adds are discarded); a later
    ``add`` of the same id re-activates it (resume-after-rollback).  A
    ``compact`` action clears the whole set (apply_deletes folded every
    prior segment into the compacted segment added right after it)."""
    act: List[int] = []
    for a in actions:
        if a.get("action") == "add":
            if a["segment"] not in act:
                act.append(a["segment"])
        elif a.get("action") == "rollback":
            dropped = set(a.get("segments", []))
            act = [s for s in act if s not in dropped]
        elif a.get("action") == "compact":
            act = []
    return act


@dataclass
class BuildStats:
    num_docs: int
    segments: int
    wall_sec: float
    docs_per_sec: float
    # phase accounting (scaling evidence: the segment phase is the
    # embarrassingly-parallel part; commit/merge is the short serial tail)
    segment_wall_sec: float = 0.0
    merge_wall_sec: float = 0.0


class IndexBuilder:
    def __init__(self, spark: SparkSession, config: IndexConfig, index_dir: str,
                 use_sql_tokenizer: bool = True, num_segments: int = 1,
                 shuffle_partitions: Optional[int] = None,
                 segment_concurrency: int = 2):
        self.spark = spark
        self.config = config
        self.index_dir = index_dir.rstrip("/")
        self.use_sql_tokenizer = use_sql_tokenizer
        self.num_segments = num_segments
        self.shuffle_partitions = shuffle_partitions
        # segments are independent jobs; submitting a few concurrently keeps
        # the cluster saturated through each job's serial tail (driver-side
        # threads — Spark's scheduler interleaves the stages)
        self.segment_concurrency = max(1, segment_concurrency)

    # -- paths ------------------------------------------------------------
    # All metadata I/O goes through fsio so the index root can be any
    # Hadoop-supported URI (file://, s3a://, abfs://, gs://), matching the
    # reference's mixed-URL split handling (merge_impl.rs:70-294).
    def _p(self, *parts) -> str:
        return fsio.join(self.index_dir, *parts)

    @property
    def manifest_dir(self) -> str:
        return self._p("_manifest")

    def _manifest_actions(self) -> List[dict]:
        from tantivy4java_spark import manifest
        return manifest.read_actions(self.spark, self.index_dir)

    def _append_manifest(self, action: dict) -> None:
        # one versioned _manifest/<n>.json per action (txlog shape,
        # native/src/txlog/actions.rs:25-37) — multi-writer safe
        from tantivy4java_spark import manifest
        manifest.append_action(self.spark, self.index_dir, action)

    def _write_initial_manifest(self, mode: Optional[str] = None) -> None:
        """First two manifest lines: protocol + field metadata.  Streaming
        and batch builds both need the metadata action — the searcher reads
        field types / shard_bits / block_size from it."""
        proto = {"action": "protocol", "version": 1,
                 "engine": "tantivy4java_spark"}
        if mode:
            proto["mode"] = mode
        self._append_manifest(proto)
        self._append_manifest({
            "action": "metadata",
            "fields": [{"name": f.name, "type": f.type, "tokenizer": f.tokenizer,
                        "index_option": f.index_option} for f in self.config.fields],
            "shard_bits": self.config.shard_bits,
            "block_size": self.config.block_size,
        })

    # -- tokenization -----------------------------------------------------
    @staticmethod
    def _is_array(df: DataFrame, name: str) -> bool:
        return isinstance(df.schema[name].dataType, T.ArrayType)

    def _text_col(self, fc: FieldConfig, df: DataFrame):
        """Text source column as ONE string, multi-value aware.

        ARRAY columns (multi-valued fields — reference arrays handled at
        parquet_companion/indexing.rs:1178,1544 and BATCH_PROTOCOL.md:58-66)
        join elements with an over-token-limit separator word: the separator
        is position-assigned by the tokenizer and then dropped by the length
        filter, so element boundaries advance positions by 2 (the tantivy
        multi-value position-gap) with ZERO per-element Python.  Documented
        deviation from the reference's array->JSON flattening: slop-0
        phrases never match across element boundaries here."""
        if self._is_array(df, fc.name):
            sep = "z" * (fc.token_limit + 1)
            return F.concat_ws(f" {sep} ", F.col(fc.name))
        return F.col(fc.name).cast("string")

    def _tokens_expr(self, fc: FieldConfig, df: DataFrame):
        col = self._text_col(fc, df)
        if self.use_sql_tokenizer:
            return sql_tokenize_expr(col, fc.tokenizer, fc.token_limit)
        return tokenize_udf(fc.tokenizer, fc.token_limit)(col)

    def _token_len_expr(self, fc: FieldConfig, df: DataFrame):
        """Kept-token COUNT for the docs-table length column: for the
        built-in lowercasing tokenizers this skips the per-token
        struct/position machinery of sql_tokenize_expr and just counts
        non-empty tokens whose lowercased utf8 length fits the limit —
        identical to size(sql_tokenize_expr(...)) (positions do not affect
        the count; the limit filter matches octet_length(lower(t)))."""
        if self.use_sql_tokenizer and fc.tokenizer in ("default", "simple",
                                                       "whitespace"):
            pat = r"[^\p{L}\p{Nd}]+" if fc.tokenizer != "whitespace"                 else r"\s+"
            col = self._text_col(fc, df).cast("string")
            lim = F.lit(fc.token_limit)
            n = F.size(F.filter(
                F.split(col, pat),
                lambda t: (t != F.lit(""))
                & (F.octet_length(F.lower(t)) <= lim)))
            return F.coalesce(n, F.lit(0))
        return F.size(self._tokens_expr(fc, df))

    # -- segment build ----------------------------------------------------
    def _docs_frame(self, seg_df: DataFrame) -> DataFrame:
        """docs-table projection: ids + sha256 + per-field token
        lengths/norms (lengths via the JVM tokenizer expr — bit-identical
        to the pandas path, asserted in tests).  Narrow, not persisted."""
        cfg = self.config
        sel = [F.col("doc_id")] + [F.col(c) for c in cfg.id_cols if c != "doc_id"]
        if cfg.content_col:
            sel.append(F.sha2(F.col(cfg.content_col).cast("string"), 256).alias("content_sha256"))
        for fc in cfg.text_fields:
            if fc.type == "string" and self._is_array(seg_df, fc.name):
                # multi-valued keyword: length 1 when present (keyword
                # scoring model stays avgdl=1 / norm=1)
                sel.append(F.when(F.size(F.col(fc.name)) > 0, 1)
                           .otherwise(0).alias(f"len_{fc.name}"))
            else:
                sel.append(self._token_len_expr(fc, seg_df)
                           .alias(f"len_{fc.name}"))
        included = {"doc_id"} | {c for c in cfg.id_cols} | \
            ({"content_sha256"} if cfg.content_col else set())
        for fc in cfg.fields:
            if fc.type == "ip":  # numeric fast column for CIDR/range rewrites
                from tantivy4java_spark.iptypes import ip_num_col
                sel.append(ip_num_col(F.col(fc.name).cast("string"))
                           .alias(f"_ipnum_{fc.name}"))
            elif (not fc.tokenized and fc.type not in ("string", "json")
                    and fc.name not in included):
                sel.append(F.col(fc.name))
        docs = seg_df.select(*sel)
        for fc in cfg.text_fields:
            docs = docs.withColumn(f"norm_{fc.name}",
                                   _norm_id_expr(F.col(f"len_{fc.name}")))
        return docs

    def _pdt_frame(self, seg_df: DataFrame) -> DataFrame:
        """Posting source rows (doc_id, field, term, tf, norm_id, pos_bin,
        shard): tokenized fields aggregate per-doc inside ONE narrow
        mapInPandas pass (no explode shuffle); raw/string fields are a plain
        select.  Narrow, not persisted."""
        cfg = self.config
        token_frames = []
        for fc in cfg.fields:
            if fc.type == "text":
                fn = _tokenize_agg_fn(fc.name, fc.tokenizer, fc.token_limit)
                token_frames.append(
                    seg_df.select("doc_id",
                                  self._text_col(fc, seg_df).alias(fc.name))
                    .mapInArrow(fn, _PDT_SCHEMA))
            elif fc.type == "string" and self._is_array(seg_df, fc.name):
                # multi-valued keyword: one term per element, tf = element
                # multiplicity (explode -> groupBy keyed (doc, term))
                token_frames.append(
                    seg_df.select("doc_id", F.explode(fc.name).alias("_v"))
                    .filter(F.col("_v").isNotNull() & (F.col("_v") != F.lit("")))
                    .groupBy("doc_id", "_v")
                    .agg(F.count(F.lit(1)).cast("long").alias("tf"))
                    .select("doc_id", F.lit(fc.name).alias("field"),
                            F.col("_v").alias("term"), "tf",
                            F.lit(1).cast("long").alias("norm_id"),
                            F.lit(None).cast("binary").alias("pos_bin")))
            elif fc.type == "string":  # raw/keyword: whole value, tf=1, len=1
                val = F.col(fc.name).cast("string")
                token_frames.append(
                    seg_df.filter(val.isNotNull() & (val != F.lit("")))
                    .select("doc_id", F.lit(fc.name).alias("field"),
                            val.alias("term"), F.lit(1).cast("long").alias("tf"),
                            F.lit(1).cast("long").alias("norm_id"),
                            F.lit(None).cast("binary").alias("pos_bin")))
            elif fc.type == "json":  # dot-path flattened terms (Q11)
                fn = _json_agg_fn(fc.name, fc.tokenizer, fc.token_limit)
                token_frames.append(
                    seg_df.select("doc_id", fc.name).mapInPandas(fn, _PDT_SCHEMA))
            elif fc.type == "ip":  # exact term + numeric fast column (§1.2)
                val = F.col(fc.name).cast("string")
                token_frames.append(
                    seg_df.filter(val.isNotNull() & (val != F.lit("")))
                    .select("doc_id", F.lit(fc.name).alias("field"),
                            val.alias("term"), F.lit(1).cast("long").alias("tf"),
                            F.lit(1).cast("long").alias("norm_id"),
                            F.lit(None).cast("binary").alias("pos_bin")))
        per_doc_term = token_frames[0]
        for tf_ in token_frames[1:]:
            per_doc_term = per_doc_term.unionByName(tf_)
        return per_doc_term.withColumn(
            "shard", F.shiftright(F.col("doc_id"), cfg.shard_bits).cast("long"))

    def _key_repartition(self, df: DataFrame, *cols):
        """Repartition by key, scale-adaptively sized: an explicit user
        shuffle_partitions wins; otherwise the partition COUNT is left to
        AQE (repartition without numPartitions starts at
        spark.sql.shuffle.partitions and adaptive coalescing right-sizes
        the output to the advisory partition bytes) — guide §2.2/§6: tiny
        segments stop producing 32 near-empty sort/encode tasks and files,
        large builds still fan out to the configured width."""
        if self.shuffle_partitions:
            return df.repartition(self.shuffle_partitions, *cols)
        return df.repartition(*cols)

    def _segment_write_jobs(self, docs: DataFrame, per_doc_term: DataFrame,
                            seg_dir: str) -> list:
        """Mutually independent write closures for ONE segment (inputs must
        already be cached): postings, termstats, docs, positions."""
        cfg = self.config
        pos_fields = [fc.name for fc in cfg.fields if fc.has_positions]

        def _write_positions():
            # positions table (position-indexed fields only; delta-varint
            # binary; includes json fields — per-dot-path positions for
            # phrase-over-path)
            (self._key_repartition(
                per_doc_term
                .filter(F.col("field").isin(pos_fields))
                .select("field", "term", "doc_id", "norm_id", "pos_bin"),
                "field", "term")
             .sortWithinPartitions("field", "term", "doc_id")
             .write.mode("overwrite").parquet(os.path.join(seg_dir, "positions")))

        def _write_postings():
            # block-encoded postings (skew-proof: keyed by (field,term,shard))
            enc = _encode_blocks_fn(cfg.block_size, with_scores=False)
            (self._key_repartition(
                per_doc_term
                .select("field", "term", "shard", "doc_id", "tf",
                        F.col("norm_id").cast("long").alias("norm_id")),
                "field", "term", "shard")
             .sortWithinPartitions("field", "term", "shard", "doc_id")
             .mapInPandas(enc, _POSTINGS_SCHEMA)
             .write.mode("overwrite").parquet(os.path.join(seg_dir, "postings")))

        def _write_termstats():
            # per-segment term stats (for global df at merge)
            (per_doc_term.groupBy("field", "term")
             .agg(F.count(F.lit(1)).cast("long").alias("df"),
                  F.sum("tf").cast("long").alias("total_tf"))
             .write.mode("overwrite").parquet(os.path.join(seg_dir, "termstats")))

        def _write_docs():
            docs.write.mode("overwrite").parquet(os.path.join(seg_dir, "docs"))

        jobs = [_write_postings, _write_termstats, _write_docs]
        if pos_fields:
            jobs.append(_write_positions)
        return jobs

    def _stat_exprs(self) -> list:
        return ([F.count(F.lit(1)).alias("_n"),
                 F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi")]
                + [F.sum(F.col(f"len_{fc.name}")).alias(f"_tok_{fc.name}")
                   for fc in self.config.text_fields])

    def _action_from_stats(self, seg_id: int, srow, t0: float) -> dict:
        num_docs = int(srow["_n"]) if srow is not None else 0
        field_tokens = {fc.name: int((srow[f"_tok_{fc.name}"]
                                      if srow is not None else 0) or 0)
                        for fc in self.config.text_fields}
        lo = srow["_lo"] if srow is not None else None
        hi = srow["_hi"] if srow is not None else None
        return {
            "action": "add",
            "segment": seg_id,
            "num_docs": num_docs,
            "doc_lo": int(lo) if lo is not None else None,
            "doc_hi": int(hi) if hi is not None else None,
            "field_tokens": field_tokens,
            "wall_sec": round(time.time() - t0, 3),
        }

    def _build_segment(self, seg_df: DataFrame, seg_id: int) -> dict:
        """Single-segment build (streaming appends, kill-test mode, and the
        one-segment fallback).  Multi-segment batch builds go through
        build()'s batched path, which shares ONE tokenize pass + ONE stats
        job across all pending segments."""
        t0 = time.time()
        seg_dir = self._p("segments", f"seg={seg_id:05d}")
        docs = self._docs_frame(seg_df).persist()
        per_doc_term = self._pdt_frame(seg_df).persist()

        # The write jobs are mutually independent once per_doc_term / docs
        # are cached, so they run CONCURRENTLY and the segment tail is the
        # slowest job (the postings encode), not the sum.  The caches are
        # materialized FIRST by dedicated jobs: letting the writers race
        # to build them measured 46% slower at 8 cores (200k docs, 101.6 s
        # vs 69.4 s serial) because concurrent first-use serializes on the
        # block manager's per-partition load locks while the blocked tasks
        # hold task slots — the expensive tokenize pass must run once at
        # full cluster width before any fan-out.
        srow = docs.agg(*self._stat_exprs()).collect()[0]
        per_doc_term.count()

        from concurrent.futures import ThreadPoolExecutor
        jobs = self._segment_write_jobs(docs, per_doc_term, seg_dir)
        with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            futs = [ex.submit(j) for j in jobs]
            for f in futs:
                f.result()
        per_doc_term.unpersist()
        docs.unpersist()
        return self._action_from_stats(seg_id, srow, t0)

    def _build_segments_batched(self, with_ids: DataFrame,
                                pending: List[int], nseg: int,
                                seg_width: Optional[int], lock) -> None:
        """Build all pending segments from ONE shared tokenize pass.

        The former per-segment loop ran, per segment, a stats-agg job, a
        cache-materialize count, and 4 write jobs — at 4 segments that is
        ~24 driver-planned jobs in 2 concurrency waves, and at bench scale
        the fixed per-job cost (planning + codegen + scheduling) dominated
        the actual work (guide §1.2 step 1).  Here the docs/per-doc-term
        frames are computed ONCE over all pending segments with a derived
        ``_seg`` column (a doc-range function of doc_id — no join), cached,
        per-segment stats collapse into ONE groupBy("_seg") job, and every
        segment's write jobs are submitted concurrently so the tail is the
        slowest single write, not waves of them.  On-disk layout, manifest
        actions and resume semantics are unchanged (each segment still gets
        its own directories and its own manifest "add")."""
        t0 = time.time()
        src = with_ids
        if seg_width is not None and len(pending) < nseg:
            src = with_ids.filter(
                F.expr(f"doc_id div {seg_width}").isin(pending))
        seg_col = (F.expr(f"doc_id div {seg_width}") if seg_width is not None
                   else F.lit(0).cast("long"))
        cfg = self.config
        dp = self.spark.sparkContext.defaultParallelism
        gd = self._docs_frame(src).withColumn("_seg", seg_col).persist()
        # the pdt frame is a 5-way union -> 5 x dp partitions; every write
        # job rescans the whole cache, so cache at cluster width (coalesce
        # is narrow: one task computes the tokenize branch partition plus
        # its 4 cheap sibling branches) — 3 write jobs x 160 cache-scan
        # tasks was the measured write-phase bottleneck
        gpdt = (self._pdt_frame(src).withColumn("_seg", seg_col)
                .coalesce(dp).persist())
        # materialize the shared caches at full cluster width, one job each
        # (see _build_segment for why the writers must not race to build
        # them); the stats agg doubles as the docs-cache builder
        dbg = os.environ.get("SPARK_GRAFT_BUILD_DEBUG") == "1"

        def _tlog(label, t_from):
            if dbg:
                import sys
                print(f"[build-batched] {label}: "
                      f"{time.time() - t_from:.3f}s", file=sys.stderr)
            return time.time()

        # The two cache-materialize jobs are independent (both read the
        # with_ids cache; its partitions are cheap to load, so concurrent
        # first-use lock contention is negligible — unlike the expensive
        # tokenize cache, which each job builds exclusively for itself).
        t = time.time()
        from concurrent.futures import ThreadPoolExecutor as _TPE
        with _TPE(max_workers=2) as _ex:
            f_stats = _ex.submit(
                lambda: gd.groupBy("_seg").agg(*self._stat_exprs()).collect())
            f_cnt = _ex.submit(gpdt.count)
            stat_rows = f_stats.result()
            f_cnt.result()
        t = _tlog("stats+pdt-cache", t)
        stats_by_seg = {int(r["_seg"]): r for r in stat_rows}

        # ONE write job per OUTPUT TYPE across all pending segments,
        # partitioned by _seg and renamed into the per-segment layout —
        # 4 jobs total instead of 4 x len(pending) concurrent small jobs
        # (which thrashed the scheduler and let AQE coalesce tiny per-
        # segment shuffles into 1-task Python encodes).  File contents per
        # segment are identical: the encode group key gains _seg, and
        # segment doc ranges are disjoint.
        tmp = self._p("segments", "_batch_tmp")
        fsio.delete(self.spark, tmp)
        pos_fields = [fc.name for fc in cfg.fields if fc.has_positions]

        def _w_postings():
            enc = _encode_blocks_fn(cfg.block_size, with_scores=False,
                                    with_seg=True)
            schema = T.StructType(
                [T.StructField("_seg", T.LongType())] + _POSTINGS_SCHEMA.fields)
            (self._key_repartition(
                gpdt.select("_seg", "field", "term", "shard", "doc_id", "tf",
                            F.col("norm_id").cast("long").alias("norm_id")),
                "_seg", "field", "term", "shard")
             .sortWithinPartitions("_seg", "field", "term", "shard", "doc_id")
             .mapInPandas(enc, schema)
             .write.mode("overwrite").partitionBy("_seg")
             .parquet(fsio.join(tmp, "postings")))

        def _w_termstats():
            (gpdt.groupBy("_seg", "field", "term")
             .agg(F.count(F.lit(1)).cast("long").alias("df"),
                  F.sum("tf").cast("long").alias("total_tf"))
             .write.mode("overwrite").partitionBy("_seg")
             .parquet(fsio.join(tmp, "termstats")))

        def _w_docs():
            # size the docs files to the data (guide §6): 32 tasks each
            # writing a sliver per segment made 128 tiny files for a 20k-doc
            # build and cost more in task scheduling than the write itself
            total_docs = sum(int(r["_n"]) for r in stat_rows)
            n_out = min(dp, max(min(dp, 4), math.ceil(total_docs / 100_000)))
            (gd.coalesce(n_out).write.mode("overwrite").partitionBy("_seg")
             .parquet(fsio.join(tmp, "docs")))

        def _w_positions():
            (self._key_repartition(
                gpdt.filter(F.col("field").isin(pos_fields))
                .select("_seg", "field", "term", "doc_id", "norm_id",
                        "pos_bin"),
                "_seg", "field", "term")
             .sortWithinPartitions("_seg", "field", "term", "doc_id")
             .write.mode("overwrite").partitionBy("_seg")
             .parquet(fsio.join(tmp, "positions")))

        from concurrent.futures import ThreadPoolExecutor
        jobs = [_w_postings, _w_termstats, _w_docs]
        subs = ["postings", "termstats", "docs"]
        if pos_fields:
            jobs.append(_w_positions)
            subs.append("positions")

        def _timed_job(j, name):
            tj = time.time()
            j()
            _tlog(f"write-{name}", tj)

        with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            for f in [ex.submit(_timed_job, j, n) for j, n in zip(jobs, subs)]:
                f.result()
        t = _tlog("write-all", t)

        # rename tmp/<sub>/_seg=<sid> -> segments/seg=NNNNN/<sub>
        for sid in pending:
            seg_dir = self._p("segments", f"seg={sid:05d}")
            fsio.makedirs(self.spark, seg_dir)
            for sub in subs:
                src_dir = fsio.join(tmp, sub, f"_seg={sid}")
                dst_dir = fsio.join(seg_dir, sub)
                fsio.delete(self.spark, dst_dir)
                if fsio.exists(self.spark, src_dir):
                    fsio.rename(self.spark, src_dir, dst_dir)
                else:  # empty segment: keep an empty dir like the old path
                    fsio.makedirs(self.spark, dst_dir)
            action = self._action_from_stats(sid, stats_by_seg.get(sid), t0)
            with lock:
                self._append_manifest(action)
        fsio.delete(self.spark, tmp)
        gpdt.unpersist()
        gd.unpersist()

    # -- merge / finalize ---------------------------------------------------
    def _segment_ok(self, seg_dir: str) -> bool:
        """Cheap validity probe (footer read) — no Spark job per segment.

        Non-posix roots: Spark's own footer read (driver-side schema
        resolution) replaces the pyarrow probe."""
        pdir = fsio.join(seg_dir, "postings")
        if fsio.has_scheme(seg_dir):
            try:
                if not fsio.isdir_nonempty(self.spark, pdir):
                    return False
                self.spark.read.parquet(pdir).schema  # footer read, no job
                return True
            except Exception:
                return False
        import pyarrow.parquet as pq
        try:
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            for f in files:
                pq.ParquetFile(os.path.join(pdir, f)).schema_arrow
            return True
        except Exception:
            return False

    def _merge_intermediate(self, seg_dirs: List[str], out_dir: str) -> None:
        """One hierarchical-merge level (S9 analog): concat+re-block postings
        per (field,term,shard) WITHOUT global scoring (that happens only at
        the final level), fold termstats, union docs/positions."""
        nparts = self.shuffle_partitions or self.spark.sparkContext.defaultParallelism
        posts = self.spark.read.parquet(*[os.path.join(d, "postings") for d in seg_dirs])
        merge_fn = _reblock_fn(self.config.block_size)
        (posts.repartition(nparts, "field", "term", "shard")
         .sortWithinPartitions("field", "term", "shard", "first_doc")
         .mapInPandas(merge_fn, _POSTINGS_SCHEMA)
         .write.mode("overwrite").parquet(os.path.join(out_dir, "postings")))
        ts = self.spark.read.parquet(*[os.path.join(d, "termstats") for d in seg_dirs])
        (ts.groupBy("field", "term")
         .agg(F.sum("df").cast("long").alias("df"),
              F.sum("total_tf").cast("long").alias("total_tf"))
         .write.mode("overwrite").parquet(os.path.join(out_dir, "termstats")))
        docs = self.spark.read.parquet(*[os.path.join(d, "docs") for d in seg_dirs])
        docs.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))
        pos_dirs = [fsio.join(d, "positions") for d in seg_dirs
                    if fsio.exists(self.spark, fsio.join(d, "positions"))]
        if pos_dirs:
            (self.spark.read.parquet(*pos_dirs)
             .repartition(max(1, nparts // 2), "field", "term")
             .sortWithinPartitions("field", "term", "doc_id")
             .write.mode("overwrite").parquet(os.path.join(out_dir, "positions")))

    def merge_hierarchical(self, segment_ids: List[int], fanin: int = 8) -> dict:
        """Multi-level merge: fold segments `fanin` at a time into
        intermediate segments, repeat, finish with the global _merge.
        At 10^12-file scale this bounds every merge job's input count
        (reference: process-based parallel merge, CLAUDE.md:163; split merge
        README.md:712-800)."""
        level = 0
        dirs = [self._p("segments", f"seg={s:05d}") for s in segment_ids]
        dirs = [d for d in dirs if self._segment_ok(d)]
        while len(dirs) > fanin:
            next_dirs = []
            for i in range(0, len(dirs), fanin):
                group = dirs[i:i + fanin]
                if len(group) == 1:
                    next_dirs.append(group[0])
                    continue
                out = self._p("segments", f"merged_L{level}_{i // fanin:04d}")
                self._merge_intermediate(group, out)
                self._append_manifest({"action": "merge_level", "level": level,
                                       "inputs": len(group), "out": out})
                next_dirs.append(out)
            dirs = next_dirs
            level += 1
        return self._merge_dirs(dirs)

    def _merge(self, segment_ids: List[int]) -> dict:
        """Merge all segment outputs into the global index (S7/S9 analog).

        Resilient like the reference's mergeSplits (merge_impl.rs:88-101):
        a segment directory that fails validation is skipped and recorded as
        a merge_skip manifest action.
        """
        ok_segments, skipped = [], []
        for sid in segment_ids:
            seg_dir = self._p("segments", f"seg={sid:05d}")
            if self._segment_ok(seg_dir):
                ok_segments.append(sid)
            else:
                skipped.append(sid)
                self._append_manifest({"action": "merge_skip", "segment": sid,
                                       "reason": "failed footer validation"})
        seg_dirs = [self._p("segments", f"seg={s:05d}") for s in ok_segments]
        action = self._merge_dirs(seg_dirs)
        action["segments"] = ok_segments
        action["skipped"] = skipped
        return action

    def _merge_dirs(self, seg_dirs: List[str]) -> dict:
        t0 = time.time()
        cfg = self.config
        nparts = self.shuffle_partitions or self.spark.sparkContext.defaultParallelism

        # global term stats
        termstats = self.spark.read.parquet(*[os.path.join(d, "termstats") for d in seg_dirs])
        terms = (termstats.groupBy("field", "term")
                 .agg(F.sum("df").cast("long").alias("df"),
                      F.sum("total_tf").cast("long").alias("total_tf")))
        terms = terms.persist()
        # RANGE-partitioned term dictionary: at 10^12-file scale the terms
        # table is billions of rows — a single-partition write would funnel
        # it through one reducer and every lookup through one monolithic
        # file.  repartitionByRange + sortWithinPartitions keeps global
        # (field, term) order ACROSS files, so Parquet min/max column stats
        # on each range file give the searcher the same pruned lookup an FST
        # would (the searcher filters field = X AND term IN (...), which
        # prunes to the one or two range files covering those keys).
        terms_parts = max(1, nparts // 4)

        def _write_terms():
            (terms.repartitionByRange(terms_parts, "field", "term")
             .sortWithinPartitions("field", "term")
             .write.mode("overwrite").parquet(self._p("terms")))

        seg_docs = self.spark.read.parquet(
            *[os.path.join(sd, "docs") for sd in seg_dirs])

        def _write_docs():
            seg_docs.repartitionByRange(max(1, nparts // 4), "doc_id") \
                .sortWithinPartitions("doc_id") \
                .write.mode("overwrite").parquet(self._p("docs"))

        len_cols = [fc.name for fc in cfg.text_fields
                    if f"len_{fc.name}" in seg_docs.columns]

        def _field_stats() -> dict:
            # corpus stats straight off the segment docs dirs (the same
            # rows _write_docs rewrites) so this job never waits on it
            srow = seg_docs.agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.sum(f"len_{n}").alias(f"_tok_{n}")
                  for n in len_cols]).collect()[0]
            num_docs = int(srow["_n"])
            stats = {"num_docs": num_docs, "fields": {}}
            for n in len_cols:
                tot = int(srow[f"_tok_{n}"] or 0)
                stats["fields"][n] = {
                    "num_docs": num_docs,
                    "total_tokens": tot,
                    "avgdl": (float(tot) / num_docs) if num_docs else 0.0,
                }
            # json fields have no docs-table length column: total tokens =
            # sum of tf over the field's terms
            for fc in cfg.fields:
                if fc.type == "json":
                    row = (terms.filter(F.col("field") == fc.name)
                           .agg(F.sum("total_tf").alias("s")).collect()[0])
                    tot = int(row["s"] or 0)
                    stats["fields"][fc.name] = {
                        "num_docs": num_docs, "total_tokens": tot,
                        "avgdl": (float(tot) / num_docs) if num_docs else 0.0,
                    }
            return stats

        # METADATA-ONLY merge of the postings (the 100TB-critical property:
        # the commit never rewrites posting payloads).  Segment postings
        # files stay in place — they are already clustered by
        # (field, term, shard, doc_id) within each segment, and segment doc
        # ranges are disjoint, so reading the dir list IS the merged,
        # doc-ordered posting stream.  What the merge computes is the tiny
        # `blockmeta` table: per block, a DECODE-FREE upper bound on the
        # BM25 contribution,
        #     bound = idf_w * max_tf / (max_tf + k1*(1-b + b*min_len/avgdl))
        # (score is monotone increasing in tf and decreasing in len, so
        # (max_tf, min_len) bounds every (tf, len) in the block).  WAND only
        # needs an upper bound; the scan reads ONLY the metadata columns
        # (parquet prunes the payload binaries), joins the broadcast idf
        # stats, and shuffles just the blockmeta rows.
        from tantivy4java_spark.fieldnorm import FIELDNORM_TABLE
        post_dirs = [os.path.join(d, "postings") for d in seg_dirs]

        def _stats_and_blockmeta() -> dict:
            stats = _field_stats()
            num_docs = stats["num_docs"]
            avgdl_map = {f: s["avgdl"] for f, s in stats["fields"].items()}
            # non-text (string/keyword) fields: avgdl 1.0 (fieldnorm-free)
            for fc in cfg.fields:
                avgdl_map.setdefault(fc.name, 1.0)
            idf_df = terms.withColumn(
                "idf_w",
                F.log(F.lit(1.0)
                      + (F.lit(float(num_docs)) - F.col("df") + F.lit(0.5))
                      / (F.col("df") + F.lit(0.5))) * F.lit(K1 + 1.0),
            ).select("field", "term", "idf_w")
            seg_postings = self.spark.read.parquet(*post_dirs)
            len_arr = F.array(*[F.lit(int(x)) for x in FIELDNORM_TABLE])
            min_len = F.element_at(
                len_arr, (F.col("min_norm_id") + F.lit(1)).cast("int")) \
                .cast("double")
            avgdl_expr = F.element_at(
                F.create_map(*[x for f, a in avgdl_map.items()
                               for x in (F.lit(f), F.lit(float(a)))]),
                F.col("field"))
            mtf = F.col("max_tf").cast("double")
            bound = (F.col("idf_w") * mtf
                     / (mtf + F.lit(K1) * (F.lit(1.0 - B)
                                           + F.lit(B) * min_len / avgdl_expr)))
            (seg_postings
             .select("field", "term", "shard", "first_doc", "count",
                     "max_tf", "min_norm_id")
             .join(F.broadcast(idf_df), ["field", "term"])
             .select("field", "term", "shard", "first_doc", "count",
                     bound.alias("block_max_score"))
             .repartitionByRange(max(1, nparts // 4), "field", "term")
             .sortWithinPartitions("field", "term", "shard", "first_doc")
             .write.mode("overwrite").parquet(self._p("blockmeta")))
            return stats

        # ALL commit jobs are mutually independent — terms table, docs
        # table, and stats+blockmeta (which reads segment dirs + the cached
        # `terms`, never the rewritten outputs) — so they run as three
        # concurrent Spark jobs and the commit tail is the SLOWEST of them,
        # not their sum.  The shared `terms` cache is safe under concurrent
        # first-use: Spark's block manager takes a per-partition load lock,
        # so one job computes a partition and the others wait for the block.
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=3) as ex:
            f_terms = ex.submit(_write_terms)
            f_docs = ex.submit(_write_docs)
            f_stats = ex.submit(_stats_and_blockmeta)
            f_terms.result()
            f_docs.result()
            stats = f_stats.result()
        num_docs = stats["num_docs"]
        stats["postings_dirs"] = [
            fsio.relpath(d, self.index_dir) for d in post_dirs]

        # positions stay in their segment directories (already clustered by
        # (field, term, doc_id)); the searcher reads the dir list from stats —
        # no merge-time rewrite of the largest table.
        pos_dirs = [fsio.relpath(fsio.join(d, "positions"), self.index_dir)
                    for d in seg_dirs
                    if fsio.exists(self.spark, fsio.join(d, "positions"))]
        stats["positions_dirs"] = pos_dirs

        fsio.write_text(self.spark, self._p("stats.json"),
                        json.dumps(stats, indent=2, sort_keys=True))
        terms.unpersist()
        return {"action": "commit",
                "num_docs": int(num_docs), "wall_sec": round(time.time() - t0, 3)}

    # -- public API ---------------------------------------------------------
    def build(self, df: DataFrame, order_cols: Optional[List[str]] = None,
              doc_id_col: Optional[str] = None,
              fail_after_segments: Optional[int] = None) -> BuildStats:
        """Full build with resume: segments already in the manifest are skipped."""
        t0 = time.time()
        dbg = os.environ.get("SPARK_GRAFT_BUILD_DEBUG") == "1"

        def _tlog(label, t_from):
            if dbg:
                import sys
                print(f"[build-pre] {label}: {time.time() - t_from:.3f}s",
                      file=sys.stderr)
            return time.time()

        fsio.makedirs(self.spark, self.index_dir)
        acts = self._manifest_actions()
        _t = _tlog("manifest-read", t0)
        if any(a.get("action") == "compact" for a in acts):
            # after apply_deletes the active set is the compacted segment
            # only; a resume here would treat 0..n-1 as pending, rebuild
            # them from the input, and drop the compacted segment at the
            # final merge — resurrecting deleted docs.  Incremental adds
            # go through streaming.add_documents instead.
            raise ValueError(
                "build() resume is not supported on an index that has been "
                "compacted by apply_deletes; use streaming.add_documents "
                "for incremental appends or build into a fresh directory")
        done = set(active_segments(acts))
        # zipWithIndex doc_ids are file-layout positions: deterministic only
        # while the input file listing is unchanged.  Fingerprint the sorted
        # listing in the manifest and refuse to resume against a different
        # one — a silently shifted listing would hand resumed segments
        # different doc_ids than the committed ones (reference analog: the
        # txlog pins the source snapshot a build was started from).
        import hashlib
        files = sorted(df.inputFiles())
        fp = hashlib.sha256("\n".join(files).encode("utf-8")).hexdigest() \
            if files else None
        if not acts:
            self._write_initial_manifest()
            if fp is not None:
                self._append_manifest({"action": "input_fingerprint",
                                       "sha256": fp, "n_files": len(files)})
        else:
            rec = [a for a in acts if a.get("action") == "input_fingerprint"]
            if rec and fp is not None and rec[-1]["sha256"] != fp:
                raise ValueError(
                    "refusing to resume: the input file listing changed "
                    f"since this build started ({rec[-1]['n_files']} files "
                    f"then, {len(files)} now / different set) — doc_id "
                    "assignment would not match the committed segments; "
                    "build into a fresh index directory instead")

        _t = _tlog("manifest-init", _t)
        total = None
        if doc_id_col is None and order_cols is None:
            # the zipWithIndex path scans the input twice; cache it first.
            # Row total falls out of the per-partition counts — no extra
            # max(doc_id) pass.
            df = df.persist()
            with_ids, total = _zip_index_ids(df)
        else:
            with_ids = assign_doc_ids(df, order_cols=order_cols,
                                      doc_id_col=doc_id_col)
        # a narrow input (e.g. one modest parquet file -> 1-2 scan splits)
        # would run the tokenize pass on a fraction of the cluster; widen to
        # cluster width AFTER doc_id assignment (ids are position/column
        # derived, so the round-robin shuffle cannot change them).  No-op at
        # scale, where scan splits >= parallelism (guide §2.5 input skew).
        _t = _tlog("assign-ids", _t)
        dp = self.spark.sparkContext.defaultParallelism
        if with_ids.rdd.getNumPartitions() < dp:
            with_ids = with_ids.repartition(dp)
        with_ids = with_ids.persist()
        nseg = max(1, self.num_segments)
        if nseg > 1:
            # doc-range segments: deterministic, independently committable
            if total is None:
                m = with_ids.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
                total = int(m) + 1 if m is not None else 0
            seg_width = max(1, math.ceil(total / nseg))
        else:
            seg_width = None
        _t = _tlog("seg-width", _t)

        import threading

        pending = [sid for sid in range(nseg) if sid not in done]
        manifest_lock = threading.Lock()
        completed = 0

        def run_segment(sid: int) -> int:
            seg_df = with_ids
            if seg_width is not None:
                seg_df = with_ids.filter(
                    (F.col("doc_id") >= sid * seg_width)
                    & (F.col("doc_id") < (sid + 1) * seg_width))
            action = self._build_segment(seg_df, sid)
            with manifest_lock:
                self._append_manifest(action)
            return sid

        if fail_after_segments is not None:
            # kill-test mode: sequential, deterministic failure point
            for sid in pending:
                run_segment(sid)
                completed += 1
                if completed >= fail_after_segments:
                    with_ids.unpersist()
                    raise RuntimeError(
                        f"injected failure after {completed} segments (kill test)")
        elif pending:
            self._build_segments_batched(with_ids, pending, nseg, seg_width,
                                         manifest_lock)

        t_merge = time.time()
        merge_action = self._merge(list(range(nseg)))
        self._append_manifest(merge_action)
        with_ids.unpersist()
        df.unpersist()
        now = time.time()
        wall = now - t0
        n = merge_action["num_docs"]
        return BuildStats(num_docs=n, segments=nseg, wall_sec=wall,
                          docs_per_sec=n / wall if wall > 0 else 0.0,
                          segment_wall_sec=t_merge - t0,
                          merge_wall_sec=now - t_merge)


def build_index(spark: SparkSession, df: DataFrame, config: IndexConfig,
                index_dir: str, **kw) -> BuildStats:
    order_cols = kw.pop("order_cols", None)
    doc_id_col = kw.pop("doc_id_col", None)
    fail_after = kw.pop("fail_after_segments", None)
    builder = IndexBuilder(spark, config, index_dir, **kw)
    return builder.build(df, order_cols=order_cols, doc_id_col=doc_id_col,
                         fail_after_segments=fail_after)
