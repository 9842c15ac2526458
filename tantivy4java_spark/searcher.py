"""IndexSearcher: lowers the query AST to DataFrame plans over index tables.

Scoring path (all JVM-side Catalyst expressions after an Arrow-batched block
decode):
  postings blocks --mapInPandas(decode)--> (term, doc_id, tf, norm_id)
  score = idf_w * tf / (tf + k1*(1-b + b*len/avgdl)),
  len decoded from norm_id via a 256-entry literal array (element_at).

Top-k uses shard-level block-max pruning (WAND analog, SURVEY.md §4 O8):
shards are doc_id ranges shared by ALL terms, so
  upper_bound(shard) = sum over query terms of max(block_max_score in shard)
is a correct per-doc bound.  Two phases: (1) score the most promising shards
until k exact scores are known -> threshold T = kth best; (2) score only
shards with bound >= T.  Everything else is pruned without being decoded.
Reference analog: tantivy's block-max skipping inside TopDocs
(native/src/searcher/jni_searcher.rs:85); cheap-filter-first short-circuit
for expensive wildcards (native/src/split_query/query_optimizer.rs:63-115).

Ties broken by ascending doc_id (tantivy breaks ties by DocAddress order).
"""

from __future__ import annotations

import json
import os
from functools import reduce
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tantivy4java_spark import codec
from tantivy4java_spark import fsio
from tantivy4java_spark import queries as Q
from tantivy4java_spark.analysis import tokenize_text
from tantivy4java_spark.fieldnorm import FIELDNORM_TABLE
from tantivy4java_spark.scoring import B, K1, idf_weight

_DECODED_SCHEMA = T.StructType([
    T.StructField("field", T.StringType()),
    T.StructField("term", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("tf", T.LongType()),
    T.StructField("norm_id", T.LongType()),
])

_SCORED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("score", T.DoubleType()),
])


def _decode_blocks(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized block decode: one pass over the whole Arrow batch."""
    for pdf in it:
        if len(pdf) == 0:
            continue
        counts = pdf["count"].to_numpy(dtype=np.int64)
        vals = codec.decode_blocks_concat(
            pdf["first_doc"].to_numpy(dtype=np.int64), counts,
            list(pdf["docs_bin"]), list(pdf["tfs_bin"]), list(pdf["norms_bin"]))
        bov = vals["block_of_value"]
        yield pd.DataFrame({
            "field": pdf["field"].to_numpy()[bov],
            "term": pdf["term"].to_numpy()[bov],
            "doc_id": vals["doc_id"],
            "tf": vals["tf"],
            "norm_id": vals["norm_id"],
        })


def _fieldnorm_len_col(norm_id_col) -> F.Column:
    """Decode fieldnorm id -> quantized length, JVM-side (literal 256-array)."""
    arr = F.array(*[F.lit(int(x)) for x in FIELDNORM_TABLE])
    return F.element_at(arr, (norm_id_col + F.lit(1)).cast("int")).cast("double")


class IndexSearcher:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir.rstrip("/")
        self._stats = json.loads(fsio.read_text(
            spark, fsio.join(self.index_dir, "stats.json")))
        self.num_docs: int = self._stats["num_docs"]
        self.field_stats: Dict[str, dict] = self._stats["fields"]
        self._meta = self._load_metadata()
        self._df_cache: Dict[Tuple[str, str], int] = {}
        self._arrow_types: Dict[Tuple[str, str], object] = {}
        self._frames: Dict[str, DataFrame] = {}
        self.last_metrics: Dict[str, float] = {}
        self._doc_source: Optional[DataFrame] = None
        self._doc_source_id: str = "doc_id"

    def set_doc_source(self, df: DataFrame, id_col: str = "doc_id") -> None:
        """Register the source/doc-store table (Parquet-companion mode: the
        source columnar table IS the stored-document store).  Enables
        one-row lookups for MoreLikeThis seed-term extraction."""
        self._doc_source = df
        self._doc_source_id = id_col

    def _load_metadata(self) -> dict:
        from tantivy4java_spark import manifest
        meta = {}
        for a in manifest.read_actions(self.spark, self.index_dir):
            if a.get("action") == "metadata":
                meta = a
        return meta

    def _field_meta(self, name: str) -> dict:
        for f in self._meta.get("fields", []):
            if f["name"] == name:
                return f
        return {"name": name, "type": "text", "tokenizer": "default"}

    def _json_base(self, dotted: str) -> Optional[Tuple[str, str]]:
        """Resolve 'props.k.x' -> (json field 'props', path 'k.x') (Q11
        dot-path addressing, query/Query.java:320-417)."""
        for f in self._meta.get("fields", []):
            if f.get("type") == "json":
                base = f["name"]
                if dotted == base:
                    return base, ""
                if dotted.startswith(base + "."):
                    return base, dotted[len(base) + 1:]
        return None

    # -- table access (DataFrames memoized; underlying scans stay lazy) -----
    def _table(self, name: str) -> DataFrame:
        if name not in self._frames:
            self._frames[name] = self.spark.read.parquet(
                os.path.join(self.index_dir, name))
        return self._frames[name]

    def postings(self) -> DataFrame:
        """Posting blocks.  After a metadata-only merge the payload files
        stay in their segment dirs (stats lists them) — segment doc ranges
        are disjoint and each dir is clustered by (field, term, shard,
        doc_id), so the union IS the merged doc-ordered stream."""
        dirs = self._stats.get("postings_dirs")
        if dirs:
            if "postings" not in self._frames:
                self._frames["postings"] = self.spark.read.parquet(
                    *[fsio.join(self.index_dir, d) for d in dirs])
            return self._frames["postings"]
        return self._table("postings")

    def blockmeta(self) -> Optional[DataFrame]:
        """Per-block WAND bounds (field, term, shard, first_doc, count,
        block_max_score) — written by the metadata-only merge.  None on
        legacy indexes that carry block_max_score inside the postings rows."""
        if not hasattr(self, "_has_blockmeta"):
            self._has_blockmeta = fsio.isdir_nonempty(
                self.spark, fsio.join(self.index_dir, "blockmeta"))
        if not self._has_blockmeta:
            return None
        return self._table("blockmeta")

    def terms(self) -> DataFrame:
        return self._table("terms")

    def docs(self) -> DataFrame:
        base = self._table("docs")
        d = self._deletes()
        return base.join(d, "doc_id", "left_anti") if d is not None else base

    def _deletes(self) -> Optional[DataFrame]:
        """Tombstoned doc_ids (IndexWriter.deleteDocuments analog — S6;
        reference deletes are tombstone-based until a merge applies them)."""
        path = fsio.join(self.index_dir, "_deletes")
        if not fsio.isdir_nonempty(self.spark, path):
            return None
        if "_deletes" not in self._frames:
            self._frames["_deletes"] = self.spark.read.parquet(path)
        return self._frames["_deletes"]

    def positions(self) -> DataFrame:
        # memoized like postings(): repeated phrase queries reuse the same
        # DataFrame, so a preload("positions") persist stays pinned to the
        # frame every later query builds on
        if "positions" not in self._frames:
            dirs = self._stats.get("positions_dirs")
            if dirs:
                self._frames["positions"] = self.spark.read.parquet(
                    *[os.path.join(self.index_dir, d) for d in dirs])
            else:
                self._frames["positions"] = self.spark.read.parquet(
                    os.path.join(self.index_dir, "positions"))
        return self._frames["positions"]

    def avgdl(self, field: str) -> float:
        st = self.field_stats.get(field)
        return st["avgdl"] if st else 1.0

    def term_df(self, field: str, term: str) -> int:
        key = (field, term)
        if key not in self._df_cache:
            rows = (self.terms()
                    .filter((F.col("field") == field) & (F.col("term") == term))
                    .select("df").collect())
            self._df_cache[key] = int(rows[0]["df"]) if rows else 0
        return self._df_cache[key]

    def _local_meta(self, table: str, filters, columns) -> Optional[pd.DataFrame]:
        """Driver-side metadata read via pyarrow when the index is on a
        local/posix path — row-group pruned, no Spark job (the L1-cache
        analog of the reference's metadata lookups).  Returns None when not
        applicable; callers fall back to a Spark job."""
        if fsio.has_scheme(self.index_dir):
            return None  # non-posix root: the Spark path handles any scheme
        return self._local_parquet([table], filters, columns)

    def term_dfs(self, pairs: Sequence[Tuple[str, str]]) -> Dict[Tuple[str, str], int]:
        missing = [p for p in pairs if p not in self._df_cache]
        if missing:
            fields = sorted({f for f, _ in missing})
            terms = sorted({t for _, t in missing})
            local = self._local_meta(
                "terms", [("field", "in", fields), ("term", "in", terms)],
                ["field", "term", "df"])
            if local is not None:
                found = {(f, t): int(d) for f, t, d in
                         zip(local["field"], local["term"], local["df"])}
            else:
                rows = (self.terms()
                        .filter(F.col("field").isin(fields) & F.col("term").isin(terms))
                        .select("field", "term", "df").collect())
                found = {(r["field"], r["term"]): int(r["df"]) for r in rows}
            for p in missing:
                self._df_cache[p] = found.get(p, 0)
        return {p: self._df_cache[p] for p in pairs}

    # -- term normalization ---------------------------------------------------
    def query_term(self, field: str, value) -> Optional[str]:
        """Apply the field's tokenizer to a query value (text fields lowercase
        through the analyzer; raw/string fields match the exact value —
        the raw-tokenizer case-preservation contract, query_converters.rs:43-57)."""
        fm = self._field_meta(field)
        if fm.get("type") == "text":
            toks = tokenize_text(str(value), fm.get("tokenizer", "default"))
            return toks[0][0] if toks else None
        return str(value)

    # -- scored decode of a set of (field, term) --------------------------------
    def _decoded_postings(self, field_terms: Sequence[Tuple[str, str]],
                          shards: Optional[Sequence[int]] = None,
                          min_block_max: Optional[float] = None,
                          shards_df: Optional[DataFrame] = None) -> DataFrame:
        p = self.postings()
        fields = sorted({f for f, _ in field_terms})
        terms = sorted({t for _, t in field_terms})
        cond = F.col("field").isin(fields) & F.col("term").isin(terms)
        p = p.filter(cond)
        if len(fields) > 1:
            # exact pair filter (isin x isin is a superset when multiple fields)
            pair = F.concat_ws("\x00", F.col("field"), F.col("term"))
            p = p.filter(pair.isin([f + "\x00" + t for f, t in field_terms]))
        if shards is not None:
            p = p.filter(F.col("shard").isin([int(s) for s in shards]))
        if shards_df is not None:
            # cluster-side survivor set (shard column): the list never
            # touches the driver — a broadcast semi-join prunes the scan
            p = p.join(F.broadcast(shards_df.select("shard").distinct()),
                       "shard")
        if min_block_max is not None:
            # block-level WAND skip: only valid when per-doc score == this
            # term's block contribution (single-term queries)
            bm = self.blockmeta()
            if bm is not None:
                keep = (bm.filter(cond
                                  & (F.col("block_max_score")
                                     >= F.lit(float(min_block_max))))
                        .select("field", "term", "shard", "first_doc"))
                if shards is not None:
                    keep = keep.filter(
                        F.col("shard").isin([int(s) for s in shards]))
                if shards_df is not None:
                    keep = keep.join(
                        F.broadcast(shards_df.select("shard").distinct()),
                        "shard")
                p = p.join(F.broadcast(keep),
                           ["field", "term", "shard", "first_doc"])
            else:  # legacy layout: bound rides inside the postings rows
                p = p.filter(
                    F.col("block_max_score") >= F.lit(float(min_block_max)))
        return p.mapInPandas(_decode_blocks, _DECODED_SCHEMA)

    def _score_decoded(self, decoded: DataFrame,
                       idf_map: Dict[Tuple[str, str], float]) -> DataFrame:
        """(field,term,doc_id,tf,norm_id) -> + score column (JVM exprs only)."""
        pairs = list(idf_map.items())
        mapping = F.create_map(*[
            x for (fld, trm), w in pairs
            for x in (F.lit(fld + "\x00" + trm), F.lit(float(w)))
        ])
        avgdl_map = F.create_map(*[
            x for fld in {f for f, _ in idf_map}
            for x in (F.lit(fld), F.lit(float(self.avgdl(fld))))
        ])
        key = F.concat_ws("\x00", F.col("field"), F.col("term"))
        idf_w = F.element_at(mapping, key)
        avgdl = F.element_at(avgdl_map, F.col("field"))
        length = _fieldnorm_len_col(F.col("norm_id"))
        tf = F.col("tf").cast("double")
        score = idf_w * tf / (tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * length / avgdl))
        return decoded.withColumn("score", score)

    def _idf_map(self, field_terms: Sequence[Tuple[str, str]]) -> Dict[Tuple[str, str], float]:
        dfs = self.term_dfs(field_terms)
        return {p: idf_weight(d, self.num_docs) for p, d in dfs.items() if d > 0}

    def _empty_scored(self) -> DataFrame:
        return self.spark.createDataFrame([], _SCORED_SCHEMA)

    def _apply_deletes(self, scored: DataFrame) -> DataFrame:
        d = self._deletes()
        return scored.join(d, "doc_id", "left_anti") if d is not None else scored

    # -- AST lowering: every node -> DataFrame(doc_id, score) -------------------
    def score_query(self, q: Q.Query) -> DataFrame:
        q = Q.normalize(q)
        return self._apply_deletes(self._score(q))

    def _score(self, q: Q.Query) -> DataFrame:
        if isinstance(q, Q.Term):
            return self._score_term(q)
        if isinstance(q, Q.TermSet):
            return self._score_termset(q)
        if isinstance(q, Q.MatchAll):
            return self.docs().select("doc_id", F.lit(1.0).alias("score"))
        if isinstance(q, Q.Boolean):
            return self._score_bool(q)
        if isinstance(q, Q.Phrase):
            return self._score_phrase(q)
        if isinstance(q, Q.Fuzzy):
            return self._score_fuzzy(q)
        if isinstance(q, (Q.Regex, Q.Wildcard)):
            return self._score_regex(q)
        if isinstance(q, Q.Range):
            return self._score_range(q)
        if isinstance(q, Q.Exists):
            jb = self._json_base(q.field)
            if jb is not None:  # jsonExistsQuery: any term under the path
                from tantivy4java_spark.build import JSON_PATH_SEP
                base, path = jb
                prefix = f"{path}{JSON_PATH_SEP}" if path else ""
                decoded = (self.postings()
                           .filter((F.col("field") == base)
                                   & F.col("term").startswith(prefix))
                           .mapInPandas(_decode_blocks, _DECODED_SCHEMA))
                return (decoded.select("doc_id").distinct()
                        .select("doc_id", F.lit(1.0).alias("score")))
            docs = self.docs()
            if q.field not in docs.columns and f"len_{q.field}" in docs.columns:
                # tokenized fields keep only len_/norm_ in the doc store:
                # exists == the field produced at least one token
                return (docs.filter(F.col(f"len_{q.field}") > 0)
                        .select("doc_id", F.lit(1.0).alias("score")))
            return (docs.filter(F.col(q.field).isNotNull())
                    .select("doc_id", F.lit(1.0).alias("score")))
        if isinstance(q, Q.Boost):
            child = self._score(q.child)
            return child.withColumn("score", F.col("score") * F.lit(float(q.factor)))
        if isinstance(q, Q.ConstScore):
            child = self._score(q.child)
            return child.withColumn("score", F.lit(float(q.score)))
        if isinstance(q, Q.DisMax):
            return self._score_dismax(q)
        if isinstance(q, Q.MoreLikeThis):
            return self._score(self._expand_mlt(q))
        raise TypeError(f"unsupported query node: {type(q).__name__}")

    # -- leaves -----------------------------------------------------------------
    def _score_term(self, q: Q.Term,
                    shards: Optional[Sequence[int]] = None) -> DataFrame:
        jb = self._json_base(q.field)
        if jb is not None:  # jsonTermQuery (Q11): term key = path\x00token
            from tantivy4java_spark.build import JSON_PATH_SEP, json_query_tokens
            base, path = jb
            toks = json_query_tokens(q.value)
            if not toks:
                return self._empty_scored()
            terms = [f"{path}{JSON_PATH_SEP}{t}" for t in dict.fromkeys(toks)]
            idf_map = self._idf_map([(base, t) for t in terms])
            if len(idf_map) < len(terms):
                return self._empty_scored()  # any missing token -> no match
            decoded = self._decoded_postings(list(idf_map.keys()), shards)
            scored = self._score_decoded(decoded, idf_map)
            if len(terms) == 1:
                return scored.select("doc_id", "score")
            # multi-token value: ALL tokens must appear under the path
            # (full-text AND lowering of json term values)
            return (scored.groupBy("doc_id")
                    .agg(F.sum("score").alias("score"),
                         F.countDistinct("term").alias("_n"))
                    .filter(F.col("_n") == len(terms))
                    .select("doc_id", "score"))
        fm = self._field_meta(q.field)
        if fm.get("type") == "ip":
            # CIDR / wildcard / exact IP -> numeric range rewrite (§4 O5,
            # native/src/split_query/parse_query.rs:59-104)
            from tantivy4java_spark.iptypes import rewrite_ip_query
            rewritten = rewrite_ip_query(q.field, str(q.value))
            if rewritten is None:
                return self._empty_scored()
            return self._score_range(rewritten)
        if fm.get("type") not in ("text", "string"):
            # numeric/date/bool term: fast-field equality, constant score
            # (range-family semantics; tantivy numeric terms are rarely
            #  rank-relevant — documented deviation)
            docs = self.docs()
            val = _coerce_typed_bound(q.value, dict(docs.dtypes).get(q.field, ""))
            return (docs.filter(F.col(q.field) == F.lit(val))
                    .select("doc_id", F.lit(1.0).alias("score")))
        term = self.query_term(q.field, q.value)
        if term is None:
            return self._empty_scored()
        idf_map = self._idf_map([(q.field, term)])
        if not idf_map:
            return self._empty_scored()
        decoded = self._decoded_postings([(q.field, term)], shards)
        return self._score_decoded(decoded, idf_map).select("doc_id", "score")

    def _score_termset(self, q: Q.TermSet) -> DataFrame:
        terms = [self.query_term(q.field, v) for v in q.values]
        pairs = [(q.field, t) for t in terms if t is not None]
        if not pairs:
            return self._empty_scored()
        decoded = self._decoded_postings(pairs)
        # TermSetQuery: union of matching docs, constant score 1.0
        return (decoded.select("doc_id").distinct()
                .select("doc_id", F.lit(1.0).alias("score")))

    def _score_multi_term_union(self, pairs: Sequence[Tuple[str, str]],
                                shards: Optional[Sequence[int]] = None) -> DataFrame:
        """OR-union of scored terms: per-doc sum of matching term scores."""
        idf_map = self._idf_map(pairs)
        if not idf_map:
            return self._empty_scored()
        decoded = self._decoded_postings(list(idf_map.keys()), shards)
        scored = self._score_decoded(decoded, idf_map)
        return scored.groupBy("doc_id").agg(F.sum("score").alias("score"))

    MAX_TERM_EXPANSIONS = 10_000  # protective bound on dictionary expansion
    # above this many estimated (term, shard) bound rows the WAND phases run
    # fully cluster-side (no driver collect of bounds, no isin literal)
    MAX_DRIVER_SHARD_ROWS = 200_000

    def _regex_expansion(self, q) -> List[str]:
        """Matched dictionary terms for a regex/wildcard query, bounded by
        MAX_TERM_EXPANSIONS.  Shared by scoring and explain."""
        pattern = q.pattern if isinstance(q, Q.Regex) else Q.wildcard_to_regex(q.pattern)
        flags = ""
        if pattern.startswith("(?i)"):  # global flags must stay at position 0
            flags, pattern = "(?i)", pattern[4:]
        if isinstance(q, Q.Regex) and not pattern.startswith("^"):
            pattern = "^(?:" + pattern + ")$"  # term-anchored like tantivy RegexQuery
        pattern = flags + pattern
        expanded = (self.terms()
                    .filter((F.col("field") == q.field) & F.col("term").rlike(pattern))
                    .select("term").limit(self.MAX_TERM_EXPANSIONS + 1).collect())
        if len(expanded) > self.MAX_TERM_EXPANSIONS:
            raise ValueError(
                f"pattern expands past {self.MAX_TERM_EXPANSIONS} terms; "
                f"narrow it (wildcard cost model: leading-* patterns are "
                f"expensive — wildcard_analysis.rs:23-96)")
        return [r["term"] for r in expanded]

    def _score_regex(self, q) -> DataFrame:
        terms = self._regex_expansion(q)
        if not terms:
            return self._empty_scored()
        decoded = self._decoded_postings([(q.field, t) for t in terms])
        # regex/wildcard: constant score (tantivy AutomatonQuery const scorer)
        return (decoded.select("doc_id").distinct()
                .select("doc_id", F.lit(1.0).alias("score")))

    def _fuzzy_expansion(self, q: Q.Fuzzy) -> List[Tuple[str, int]]:
        """Matched dictionary terms for a fuzzy query with their edit
        distances, bounded by MAX_TERM_EXPANSIONS.  Shared by scoring and
        explain.  Distances are recomputed driver-side on the (already
        capped, tiny) expansion — cheaper than shipping them through the
        scan filter."""
        text = self.query_term(q.field, q.text)
        if text is None:
            return []
        dist = int(q.distance)
        osa = bool(q.transposition_cost_one)
        terms = self._fuzzy_matched_terms(q, text, dist, osa)
        return [(t, _edit_distance(text, t, dist, osa)) for t in terms]

    def _score_fuzzy(self, q: Q.Fuzzy) -> DataFrame:
        text = self.query_term(q.field, q.text)
        if text is None:
            return self._empty_scored()
        dist = int(q.distance)
        osa = bool(q.transposition_cost_one)
        terms = self._fuzzy_matched_terms(q, text, dist, osa)
        pairs = [(q.field, t) for t in terms]
        if not pairs:
            return self._empty_scored()
        return self._score_multi_term_union(pairs)

    # above this many dictionary rows for one field the driver-side pyarrow
    # expansion falls back to the cluster path (the dictionary no longer
    # belongs on the driver)
    MAX_LOCAL_DICT_ROWS = 2_000_000

    def _fuzzy_matched_terms(self, q: Q.Fuzzy, text: str, dist: int,
                             osa: bool) -> List[str]:
        local = self._fuzzy_local_expansion(q, text, dist, osa)
        if local is not None:
            return local
        return self._fuzzy_cluster_expansion(q, text, dist, osa)

    def _fuzzy_local_expansion(self, q: Q.Fuzzy, text: str, dist: int,
                               osa: bool) -> Optional[List[str]]:
        """Driver-side pyarrow expansion over the (posix, row-group-pruned)
        term dictionary — NO Spark job, so a fuzzy query costs a single
        scoring job instead of expansion + scoring.  Valid exactly where the
        dictionary is small enough to read driver-side (the same regime as
        the _local_meta term-df lookups); object-store roots and oversized
        dictionaries return None and take the cluster path.  As a side
        effect the matched terms' dfs warm _df_cache, so the following
        _idf_map issues no lookup at all."""
        local = self._local_meta("terms", [("field", "==", q.field)],
                                 ["term", "df"])
        if local is None or len(local) > self.MAX_LOCAL_DICT_ROWS:
            return None
        terms = local["term"].astype(str)
        mask = (terms.str.len() - len(text)).abs() <= dist
        if q.prefix:
            mask &= terms.str.startswith(text[:1])
        cand = terms[mask].tolist()
        if cand:
            keep = _osa_within_batch(text, cand, dist, osa)
            matched = [t for t, k in zip(cand, keep) if k]
            dfs = local["df"][mask].to_numpy()[keep]
        else:
            matched, dfs = [], []
        if len(matched) > self.MAX_TERM_EXPANSIONS:
            raise ValueError(
                f"fuzzy query expands past {self.MAX_TERM_EXPANSIONS} terms; "
                f"lower the distance or add a prefix "
                f"(FuzzyTermQuery expansion bound)")
        for t, d in zip(matched, dfs):
            self._df_cache[(q.field, t)] = int(d)
        return matched

    def _fuzzy_cluster_expansion(self, q: Q.Fuzzy, text: str, dist: int,
                                 osa: bool) -> List[str]:
        cand = self.terms().filter(F.col("field") == q.field)
        # cheap length prefilter stays JVM-side before the distance check
        cand = cand.filter(F.abs(F.length("term") - F.lit(len(text))) <= F.lit(dist))
        if q.prefix:
            cand = cand.filter(F.col("term").startswith(text[:1]))
        if not osa:
            # classic Levenshtein: Spark's built-in (bounded) edit distance
            # keeps the whole expansion inside codegen — no Python UDF
            cand = cand.filter(
                F.levenshtein(F.lit(text), F.col("term"), dist) >= 0)
        else:
            # OSA (transposition cost 1) has no Spark built-in; Arrow UDF
            # running the DP batch-vectorized: the loops cover
            # len(query) x max_term_len CELLS, each cell a numpy op over
            # the whole candidate batch — no per-term Python lambda
            @F.pandas_udf(T.BooleanType())
            def within(terms: pd.Series) -> pd.Series:
                return pd.Series(
                    _osa_within_batch(text, terms.tolist(), dist),
                    index=terms.index)
            cand = cand.filter(within(F.col("term")))
        # same protective bound as regex/wildcard: never collect an
        # unbounded matched-term set to the driver (a distance-2 query
        # against a billion-term dictionary can expand arbitrarily)
        expanded = (cand.select("term")
                    .limit(self.MAX_TERM_EXPANSIONS + 1).collect())
        if len(expanded) > self.MAX_TERM_EXPANSIONS:
            raise ValueError(
                f"fuzzy query expands past {self.MAX_TERM_EXPANSIONS} terms; "
                f"lower the distance or add a prefix "
                f"(FuzzyTermQuery expansion bound)")
        return [r["term"] for r in expanded]

    def _score_range(self, q: Q.Range) -> DataFrame:
        jb = self._json_base(q.field)
        if jb is not None:  # jsonRangeQuery: numeric compare over path tokens
            from tantivy4java_spark.build import JSON_PATH_SEP
            base, path = jb
            prefix = f"{path}{JSON_PATH_SEP}"
            cand = (self.terms()
                    .filter((F.col("field") == base)
                            & F.col("term").startswith(prefix))
                    .withColumn("_v", F.expr(
                        f"try_cast(substring(term, {len(prefix) + 1}) as double)"))
                    .filter(F.col("_v").isNotNull()))
            cond = F.lit(True)
            if q.lower is not None:
                lv = F.lit(float(q.lower))
                cond = cond & (F.col("_v") >= lv if q.include_lower else F.col("_v") > lv)
            if q.upper is not None:
                uv = F.lit(float(q.upper))
                cond = cond & (F.col("_v") <= uv if q.include_upper else F.col("_v") < uv)
            # terms -> postings join stays ON THE CLUSTER: a wide numeric
            # range over a high-cardinality JSON path must never collect
            # term strings to the driver (unbounded memory).  The prefix
            # filter is pushed to both parquet scans; AQE picks a broadcast
            # when the matched term set is small.
            matched = cand.filter(cond).select("field", "term")
            p = (self.postings()
                 .filter((F.col("field") == base)
                         & F.col("term").startswith(prefix))
                 .join(matched, ["field", "term"]))
            decoded = p.mapInPandas(_decode_blocks, _DECODED_SCHEMA)
            return (decoded.select("doc_id").distinct()
                    .select("doc_id", F.lit(1.0).alias("score")))
        fm = self._field_meta(q.field)
        docs = self.docs()
        if fm.get("type") == "ip":
            # IP range (SplitRangeQueryTest ip cases): bounds become hex32
            # and compare lexicographically on the canonical fast column —
            # hex order == numeric order across v4-mapped and full v6
            from tantivy4java_spark.iptypes import ip_to_hex
            num_field = f"_ipnum_{q.field}"
            if num_field not in docs.columns:
                raise ValueError(f"range query needs a fast field: {q.field}")
            col = F.col(num_field)
            cond = F.lit(True)
            if q.lower is not None:
                lo = ip_to_hex(str(q.lower))
                cond = cond & (col >= F.lit(lo) if q.include_lower
                               else col > F.lit(lo))
            if q.upper is not None:
                hi = ip_to_hex(str(q.upper))
                cond = cond & (col <= F.lit(hi) if q.include_upper
                               else col < F.lit(hi))
            return docs.filter(cond).select(
                "doc_id", F.lit(1.0).alias("score"))
        if q.field not in docs.columns:
            raise ValueError(f"range query needs a fast field: {q.field}")
        dtype = dict(docs.dtypes).get(q.field, "")
        lower = _coerce_typed_bound(q.lower, dtype)
        upper = _coerce_typed_bound(q.upper, dtype)
        col = F.col(q.field)
        cond = F.lit(True)
        if lower is not None:
            cond = cond & (col >= F.lit(lower) if q.include_lower else col > F.lit(lower))
        if upper is not None:
            cond = cond & (col <= F.lit(upper) if q.include_upper else col < F.lit(upper))
        return docs.filter(cond).select("doc_id", F.lit(1.0).alias("score"))

    # -- phrase ------------------------------------------------------------------
    def _phrase_components(self, q: Q.Phrase):
        """(matched[doc_id, norm_id, tf], field, terms, idf_w) for a phrase,
        or None when a term is missing (empty result).  Shared by scoring and
        explain so both see identical phrase-tf semantics."""
        return self._score_phrase(q, _components=True)

    def _score_phrase(self, q: Q.Phrase, _components: bool = False) -> DataFrame:
        jb = self._json_base(q.field)
        if jb is not None:
            # phrase over a json dot-path (JsonFieldQueryTest.java,
            # README.md:111-179): terms are "<path>\x00<token>" in the base
            # field's positions table (per-path position streams)
            from tantivy4java_spark.build import (JSON_PATH_SEP,
                                                  json_query_tokens)
            base, path = jb
            words = []
            for w in q.words:
                words.extend(json_query_tokens(w))
            if not words:
                return None if _components else self._empty_scored()
            field = base
            terms = [f"{path}{JSON_PATH_SEP}{w}" for w in words]
        else:
            words = [self.query_term(q.field, w) for w in q.words]
            if any(w is None for w in words) or not words:
                return None if _components else self._empty_scored()
            field = q.field
            terms = list(words)
        if len(terms) == 1 and not _components:
            return self._score_term(Q.Term(q.field, words[0]))
        uniq = sorted(set(terms))
        dfs = self.term_dfs([(field, t) for t in uniq])
        if any(dfs[(field, t)] == 0 for t in uniq):
            return None if _components else self._empty_scored()
        # ONE scan of the positions table for all phrase terms; positions
        # rows carry norm_id so no doc-store join is needed
        pos = (self.positions()
               .filter((F.col("field") == field) & F.col("term").isin(uniq)))
        # rarest-term pre-intersection (round-3 verdict: phrase cost must be
        # ~min-df, not sum-of-df).  For "the merge" the groupBy would shuffle
        # the positions of "the" across the whole corpus; tantivy's
        # intersection skips them to docs containing "merge".  A BROADCAST
        # semi-join on the rarest term's doc set prunes the scan the same
        # way — data past the scan drops from sum(df) to ~n_terms*min_df.
        # Gated: broadcast only a small doc set, and only when the dfs are
        # skewed enough that the extra rare-term scan pays for itself.
        df_vals = [dfs[(field, t)] for t in uniq]
        if (len(uniq) > 1 and min(df_vals) <= 200_000
                and sum(df_vals) > 4 * min(df_vals)):
            rare = min(uniq, key=lambda t: dfs[(field, t)])
            rare_docs = (self.positions()
                         .filter((F.col("field") == field)
                                 & (F.col("term") == rare))
                         .select("doc_id"))
            pos = pos.join(F.broadcast(rare_docs), "doc_id", "left_semi")
        per_doc = (pos.groupBy("doc_id")
                   .agg(F.map_from_entries(
                        F.collect_list(F.struct("term", "pos_bin"))).alias("pmap"),
                        F.first("norm_id").alias("norm_id"),
                        F.count(F.lit(1)).alias("nterms"))
                   .filter(F.col("nterms") == len(uniq)))
        arrays = F.array(*[F.element_at(F.col("pmap"), F.lit(t)) for t in terms])
        slop = int(q.slop)
        nterms = len(terms)

        @F.pandas_udf(T.LongType())
        def phrase_tf(arrs: pd.Series) -> pd.Series:
            if len(arrs) == 0:
                return pd.Series([], dtype="int64")
            bufs_per_term = [[row[i] for row in arrs] for i in range(nterms)]
            return pd.Series(_phrase_freq_batch(bufs_per_term, slop))

        matched = (per_doc.select("doc_id", "norm_id",
                                  phrase_tf(arrays).alias("tf"))
                   .filter(F.col("tf") > 0))
        # combined idf over phrase terms as given (Lucene/tantivy: sum of idf)
        idf_w = sum(idf_weight(dfs[(field, t)], self.num_docs) for t in terms)
        if _components:
            return matched, field, terms, idf_w
        avgdl = self.avgdl(field)
        length = _fieldnorm_len_col(F.col("norm_id"))
        tf = F.col("tf").cast("double")
        score = (F.lit(idf_w) * tf
                 / (tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * length / F.lit(avgdl))))
        return matched.select("doc_id", score.alias("score"))

    # -- boolean -----------------------------------------------------------------
    def _docids(self, q: Q.Query) -> DataFrame:
        return self._score(q).select("doc_id")

    def _is_expensive(self, q: Q.Query) -> bool:
        if isinstance(q, Q.Wildcard):
            return Q.is_expensive_wildcard(q.pattern)
        if isinstance(q, (Q.Regex, Q.Fuzzy)):
            return True
        return False

    def _score_bool(self, q: Q.Boolean) -> DataFrame:
        must = list(q.must)
        should = list(q.should)
        must_not = list(q.must_not)
        msm = q.minimum_should_match or 0

        # cheap-filter-first short-circuit (query_optimizer.rs:63-115):
        # if the cheap MUST side is empty, skip the expensive clauses entirely.
        cheap_must = [c for c in must if not self._is_expensive(c)]
        exp_clauses = [c for c in must + should if self._is_expensive(c)]
        if cheap_must and exp_clauses:
            probe = self._intersect_scored([self._score(c) for c in cheap_must])
            if probe.limit(1).count() == 0:
                self.last_metrics["short_circuit"] = 1
                return self._empty_scored()
            base_must = probe
        elif must:
            base_must = self._intersect_scored([self._score(c) for c in must])
        else:
            base_must = None
        if cheap_must and exp_clauses:
            rest = [c for c in must if self._is_expensive(c)]
            if rest:
                base_must = self._intersect_scored(
                    [base_must] + [self._score(c) for c in rest])

        should_scored = None
        if should:
            # an explicitly set minimum_should_match is honored even when
            # must clauses exist (SplitBooleanQuery semantics); normalize()
            # only injects msm=1 for pure-SHOULD booleans, so msm>0 here with
            # must present means the caller asked for it.
            should_scored = self._union_scored(
                [self._score(c) for c in should], min_match=msm)

        if base_must is not None and should_scored is not None:
            # msm>0 with must: docs must satisfy the must intersection AND
            # >= msm should clauses -> inner join; otherwise should is
            # optional scoring context -> left join.
            how = "inner" if msm > 0 else "left"
            out = (base_must.alias("m")
                   .join(should_scored.alias("s"), "doc_id", how)
                   .select(F.col("doc_id"),
                           (F.col("m.score")
                            + F.coalesce(F.col("s.score"), F.lit(0.0))).alias("score")))
        elif base_must is not None:
            out = base_must
        elif should_scored is not None:
            out = should_scored
        elif must_not:
            # pure-negative boolean: quickwit injects an implicit AllQuery
            # positive clause, so `NOT foo` matches every non-excluded doc
            # at constant score 1.0
            out = self.docs().select("doc_id", F.lit(1.0).alias("score"))
        else:
            return self._empty_scored()

        for c in must_not:
            out = out.join(self._docids(c), "doc_id", "left_anti")
        return out

    def _intersect_scored(self, frames: List[DataFrame]) -> DataFrame:
        """MUST semantics: docs in every frame; score = fixed-order sum."""
        out = frames[0].withColumnRenamed("score", "s0")
        for i, f in enumerate(frames[1:], start=1):
            out = out.join(f.withColumnRenamed("score", f"s{i}"), "doc_id")
        total = reduce(lambda a, b: a + b,
                       [F.col(f"s{i}") for i in range(len(frames))])
        return out.select("doc_id", total.alias("score"))

    def _union_scored(self, frames: List[DataFrame], min_match: int = 0) -> DataFrame:
        """SHOULD semantics: union, per-doc sum, optional minimum_should_match."""
        if len(frames) <= 8:
            out = frames[0].select("doc_id", F.col("score").alias("s0"))
            for i, f in enumerate(frames[1:], start=1):
                out = out.join(f.withColumnRenamed("score", f"s{i}"),
                               "doc_id", "full_outer")
            score = reduce(lambda a, b: a + b,
                           [F.coalesce(F.col(f"s{i}"), F.lit(0.0))
                            for i in range(len(frames))])
            nmatch = reduce(lambda a, b: a + b,
                            [F.when(F.col(f"s{i}").isNotNull(), 1).otherwise(0)
                             for i in range(len(frames))])
            out = out.select("doc_id", score.alias("score"), nmatch.alias("_n"))
        else:
            tagged = [f.withColumn("_c", F.lit(i)) for i, f in enumerate(frames)]
            u = reduce(lambda a, b: a.unionByName(b), tagged)
            out = (u.groupBy("doc_id")
                   .agg(F.sum("score").alias("score"),
                        F.countDistinct("_c").alias("_n")))
        if min_match > 1:
            out = out.filter(F.col("_n") >= min_match)
        return out.select("doc_id", "score")

    def _score_dismax(self, q: Q.DisMax) -> DataFrame:
        frames = [self._score(c) for c in q.queries]
        out = frames[0].select("doc_id", F.col("score").alias("s0"))
        for i, f in enumerate(frames[1:], start=1):
            out = out.join(f.withColumnRenamed("score", f"s{i}"), "doc_id", "full_outer")
        cols = [F.coalesce(F.col(f"s{i}"), F.lit(0.0)) for i in range(len(frames))]
        mx = F.greatest(*cols) if len(cols) > 1 else cols[0]
        total = reduce(lambda a, b: a + b, cols)
        score = mx + F.lit(float(q.tie_breaker)) * (total - mx)
        return out.select("doc_id", score.alias("score"))

    # -- MoreLikeThis -------------------------------------------------------------
    def _mlt_seed_terms(self, q: Q.MoreLikeThis) -> List[Tuple[str, int]]:
        """(term, tf) pairs of the seed doc.  Preference order:
        1. q.text (driver-side tokenize, zero cluster reads)
        2. one-row doc-store lookup (set_doc_source) + driver tokenize —
           a pruned point read, NOT a whole-shard postings decode
        3. fallback: decode the doc's shard postings blocks (bare index,
           no source registered)."""
        from collections import Counter
        fm = self._field_meta(q.field)
        tokenizer = fm.get("tokenizer", "default")

        text = q.text
        if text is None and self._doc_source is not None:
            rows = (self._doc_source
                    .filter(F.col(self._doc_source_id) == q.doc_id)
                    .select(q.field).limit(1).collect())
            if not rows or rows[0][q.field] is None:
                return []
            text = str(rows[0][q.field])
        if text is not None:
            cnt = Counter(t for t, _ in tokenize_text(text, tokenizer))
            return [(t, c) for t, c in cnt.items()]
        shard = q.doc_id >> self._meta.get("shard_bits", 16)
        blocks = (self.postings()
                  .filter((F.col("field") == q.field) & (F.col("shard") == shard)
                          & (F.col("first_doc") <= q.doc_id)
                          & (F.col("last_doc") >= q.doc_id)))
        decoded = blocks.mapInPandas(_decode_blocks, _DECODED_SCHEMA)
        rows = (decoded.filter(F.col("doc_id") == q.doc_id)
                .select("term", "tf").collect())
        return [(r["term"], int(r["tf"])) for r in rows]

    def _expand_mlt(self, q: Q.MoreLikeThis) -> Q.Query:
        cand = [(t, tf) for t, tf in self._mlt_seed_terms(q)
                if tf >= q.min_term_freq]
        if not cand:
            return Q.Boolean()
        dfs = self.term_dfs([(q.field, t) for t, _ in cand])
        picked = []
        for term, tf in cand:
            df = dfs[(q.field, term)]
            if df < q.min_doc_freq:
                continue
            if q.max_doc_freq is not None and df > q.max_doc_freq:
                continue
            picked.append((idf_weight(df, self.num_docs) * tf, term))
        picked.sort(reverse=True)
        terms = [t for _, t in picked[: q.max_query_terms]]
        should = tuple(Q.Term(q.field, t) for t in terms)
        base: Q.Query = Q.Boolean(should=should)
        if q.boost_factor != 1.0:
            base = Q.Boost(base, q.boost_factor)
        return base

    # -- top-k with shard-level block-max pruning ----------------------------------
    def _pure_term_clauses(self, q: Q.Query) -> Optional[Tuple[str, List[Tuple[str, str]]]]:
        """Detect Term / pure-term Boolean shapes eligible for WAND pruning."""
        if isinstance(q, Q.Term):
            if self._json_base(q.field) is not None:
                return None  # json terms take the full scoring path
            fm = self._field_meta(q.field)
            if fm.get("type") in ("text", "string"):
                t = self.query_term(q.field, q.value)
                return ("or", [(q.field, t)]) if t else None
            return None
        if isinstance(q, Q.Boolean) and not q.must_not:
            kids = list(q.must) + list(q.should)
            if (q.minimum_should_match or 0) > 1:
                return None
            if not kids or not all(isinstance(c, Q.Term) for c in kids):
                return None
            pairs = []
            for c in kids:
                if self._json_base(c.field) is not None:
                    return None
                fm = self._field_meta(c.field)
                if fm.get("type") not in ("text", "string"):
                    return None
                t = self.query_term(c.field, c.value)
                if t is None:
                    return None
                pairs.append((c.field, t))
            if q.must and not q.should:
                return ("and", pairs)
            if q.should and not q.must:
                return ("or", pairs)
        return None

    def search(self, q: Q.Query, limit: int = 10, prune: bool = True,
               order_by_field: Optional[str] = None, ascending: bool = False,
               offset: int = 0) -> DataFrame:
        """Top-k as a DataFrame(doc_id, score).

        Default order: score desc, doc_id asc (tantivy tie semantics).
        order_by_field / offset implement the Searcher.search orderByField /
        offset params the reference EXPOSES but its native side ignores
        (core/Searcher.java:59 vs jni_searcher.rs:67-70) — parity-plus.
        """
        q = Q.normalize(q)
        self.last_metrics = {}
        # Boost wrappers with a positive factor preserve ranking (score
        # scales monotonically), so WAND pruning applies to the unwrapped
        # child; the factor is re-applied to the pruned scores after.
        # (ConstScore stays on the full path: its ties are broken by doc_id,
        # so a score-pruned subset would pick the wrong k docs.)
        scale = 1.0
        base_q = q
        while isinstance(base_q, Q.Boost) and float(base_q.factor) > 0:
            scale *= float(base_q.factor)
            base_q = base_q.child
        # field-ordered results must rank over the FULL match set, not a
        # BM25-score-pruned subset — disable WAND pruning when ordering by
        # a field value.
        if prune and not order_by_field:
            # driver-side fast path: evaluate the WHOLE query locally when
            # the index root is posix and the candidate volume is small
            # (Boost/ConstScore/DisMax/Boolean handled inside, so ranking
            # and scale semantics are the node evaluators' own)
            local = self._local_search_pdf(q)
            if local is not None:
                rows = local.iloc[offset:] if offset else local
                return self._local_scored_df(rows.head(limit))
        elif prune and order_by_field:
            # field-ordered fast path: the local evaluator holds the FULL
            # match set (never score-pruned), so ordering by a doc value is
            # a local column merge + stable sort
            out = self._local_sorted_search(q, order_by_field, ascending,
                                            offset, limit)
            if out is not None:
                return out
        shape = self._pure_term_clauses(base_q) \
            if (prune and not order_by_field) else None
        if shape is not None:
            scored = self._scored_pruned(shape[0], shape[1],
                                         limit + offset)
            if scale != 1.0:
                scored = scored.withColumn(
                    "score", F.col("score") * F.lit(scale))
        else:
            scored = self._score(q)
        scored = self._apply_deletes(scored)
        if order_by_field:
            field_col = self.docs().select("doc_id", order_by_field)
            scored = scored.join(field_col, "doc_id")
            order = [F.asc(order_by_field) if ascending
                     else F.desc(order_by_field), F.asc("doc_id")]
        else:
            order = [F.desc("score"), F.asc("doc_id")]
        out = scored.orderBy(*order)
        if offset:
            out = out.offset(offset)
        return out.limit(limit)

    _EXPLAIN_SCHEMA = ("kind string, field string, term string, doc_id long, "
                       "tf long, norm_id int, quantized_len double, df long, "
                       "num_docs double, distance int, score double")

    def explain(self, q: Q.Query, doc_id: int) -> DataFrame:
        """Per-term score components for one doc (Query.explain analog, Q15 —
        the reference's native impl is a stub; ours emits real components).

        kind='term' rows carry the BM25 inputs per query term.
        kind='phrase' emits one row per phrase (term = joined words,
        tf = phrase frequency, df = combined-idf component count is in the
        per-word 'phrase-term' rows that follow).
        kind='fuzzy-term' emits one row per matched dictionary term with its
        edit distance.
        kind='regex-term'/'wildcard-term'/'termset-term' emits one row per
        matched dictionary term present in the doc; score is the constant
        1.0 these queries contribute (AutomatonQuery const scorer)."""
        q = Q.normalize(q)
        if isinstance(q, Q.Phrase):
            return self._explain_phrase(q, doc_id)
        if isinstance(q, Q.Fuzzy):
            return self._explain_fuzzy(q, doc_id)
        if isinstance(q, (Q.Regex, Q.Wildcard)):
            kind = "regex-term" if isinstance(q, Q.Regex) else "wildcard-term"
            return self._explain_expansion(
                q.field, self._regex_expansion(q), kind, doc_id)
        if isinstance(q, Q.TermSet):
            terms = [t for t in (self.query_term(q.field, v)
                                 for v in q.values) if t is not None]
            return self._explain_expansion(q.field, terms, "termset-term",
                                           doc_id)
        terms: List[Tuple[str, str]] = []

        def walk(node):
            if isinstance(node, Q.Term):
                t = self.query_term(node.field, node.value)
                if t is not None:
                    terms.append((node.field, t))
            elif isinstance(node, Q.Boolean):
                for c in list(node.must) + list(node.should):
                    walk(c)
            elif isinstance(node, (Q.Boost, Q.ConstScore)):
                walk(node.child)
            elif isinstance(node, Q.DisMax):
                for c in node.queries:
                    walk(c)

        walk(q)
        if not terms:
            raise ValueError("explain supports term-based queries")
        idf_map = self._idf_map(terms)
        shard = doc_id >> self._meta.get("shard_bits", 16)
        decoded = self._decoded_postings(list(idf_map), shards=[shard]) \
            .filter(F.col("doc_id") == doc_id)
        scored = self._score_decoded(decoded, idf_map)
        dfs = self.term_dfs(list(idf_map))
        df_map = F.create_map(*[x for (fld, trm), d in dfs.items()
                                for x in (F.lit(fld + "\x00" + trm), F.lit(d))])
        key = F.concat_ws("\x00", F.col("field"), F.col("term"))
        return scored.select(
            F.lit("term").alias("kind"),
            "field", "term", "doc_id", "tf", "norm_id",
            _fieldnorm_len_col(F.col("norm_id")).alias("quantized_len"),
            F.element_at(df_map, key).cast("long").alias("df"),
            F.lit(float(self.num_docs)).alias("num_docs"),
            F.lit(None).cast("int").alias("distance"),
            F.col("score"))

    def _explain_expansion(self, field: str, terms: List[str], kind: str,
                           doc_id: int) -> DataFrame:
        """Component rows for multi-term const-score expansions (regex /
        wildcard / termset): one row per matched dictionary term the doc
        actually contains, with its tf/df; score = the constant 1.0."""
        if not terms:
            return self.spark.createDataFrame([], self._EXPLAIN_SCHEMA)
        pairs = [(field, t) for t in dict.fromkeys(terms)]
        shard = doc_id >> self._meta.get("shard_bits", 16)
        decoded = self._decoded_postings(pairs, shards=[shard]) \
            .filter(F.col("doc_id") == doc_id)
        dfs = self.term_dfs(pairs)
        df_map = F.create_map(*[x for (fld, trm), d in dfs.items()
                                for x in (F.lit(fld + "\x00" + trm),
                                          F.lit(int(d)))])
        key = F.concat_ws("\x00", F.col("field"), F.col("term"))
        return decoded.select(
            F.lit(kind).alias("kind"),
            "field", "term", "doc_id", "tf", "norm_id",
            _fieldnorm_len_col(F.col("norm_id")).alias("quantized_len"),
            F.element_at(df_map, key).cast("long").alias("df"),
            F.lit(float(self.num_docs)).alias("num_docs"),
            F.lit(None).cast("int").alias("distance"),
            F.lit(1.0).alias("score"))

    def _explain_phrase(self, q: Q.Phrase, doc_id: int) -> DataFrame:
        comp = self._phrase_components(q)
        if comp is None:
            return self.spark.createDataFrame([], self._EXPLAIN_SCHEMA)
        matched, field, terms, idf_w = comp
        avgdl = self.avgdl(field)
        length = _fieldnorm_len_col(F.col("norm_id"))
        tf = F.col("tf").cast("double")
        score = (F.lit(idf_w) * tf
                 / (tf + F.lit(K1) * (F.lit(1.0 - B)
                                      + F.lit(B) * length / F.lit(avgdl))))
        phrase_row = (matched.filter(F.col("doc_id") == doc_id).select(
            F.lit("phrase").alias("kind"),
            F.lit(field).alias("field"),
            F.lit(" ".join(terms)).alias("term"),
            "doc_id", "tf", "norm_id",
            length.alias("quantized_len"),
            F.lit(None).cast("long").alias("df"),
            F.lit(float(self.num_docs)).alias("num_docs"),
            F.lit(None).cast("int").alias("distance"),
            score.alias("score")))
        # one component row per phrase word: its df and idf contribution
        # (combined phrase idf = sum of these idf weights)
        dfs = self.term_dfs([(field, t) for t in sorted(set(terms))])
        word_rows = self.spark.createDataFrame(
            [("phrase-term", field, t, doc_id, None, None, None,
              int(dfs[(field, t)]), float(self.num_docs), None,
              float(idf_weight(dfs[(field, t)], self.num_docs)))
             for t in terms], self._EXPLAIN_SCHEMA)
        return phrase_row.unionByName(word_rows)

    def _explain_fuzzy(self, q: Q.Fuzzy, doc_id: int) -> DataFrame:
        expansion = self._fuzzy_expansion(q)
        if not expansion:
            return self.spark.createDataFrame([], self._EXPLAIN_SCHEMA)
        dist_map = dict(expansion)
        base = self.explain(
            Q.Boolean(should=tuple(Q.Term(q.field, t)
                                   for t, _ in expansion)), doc_id)
        dist_col = F.create_map(*[x for t, d in dist_map.items()
                                  for x in (F.lit(t), F.lit(int(d)))])
        return base.select(
            F.lit("fuzzy-term").alias("kind"),
            "field", "term", "doc_id", "tf", "norm_id", "quantized_len",
            "df", "num_docs",
            F.element_at(dist_col, F.col("term")).alias("distance"),
            "score")

    # -- driver-side top-k fast path -----------------------------------------
    # Below this many candidate postings rows (sum of the query terms' dfs)
    # the whole match set is decoded and ranked ON THE DRIVER via pyarrow +
    # numpy: zero Spark jobs, so selective queries run at native-library
    # latency instead of the local-mode job-scheduling floor (~0.5 s).  The
    # reference is itself a single-process library (core/Searcher.java), so
    # this is its latency analog; the cluster WAND paths above the cap stay
    # the canonical implementation and produce identical, oracle-pinned
    # results.  Tests force the cluster paths by setting this to 0.
    LOCAL_TOPK_MAX_ROWS = 200_000

    _POSTING_BLOCK_COLS = ["field", "term", "first_doc", "count",
                           "docs_bin", "tfs_bin", "norms_bin"]

    def _local_dataset(self, dirs: List[str]):
        """Memoized pyarrow dataset over index table dir(s) — the
        file-listing + footer-metadata analog of the reference's split
        cache: repeated fast-path queries stop re-opening and re-parsing
        every parquet footer (measured ~half the per-query latency).  The
        file SET is pinned at first use, mirroring preload()'s Spark-side
        cache semantics; a new IndexSearcher sees new files."""
        key = tuple(dirs)
        cache = self.__dict__.setdefault("_pq_ds_cache", {})
        if key not in cache:
            import pyarrow.dataset as pads
            paths = [os.path.join(self.index_dir, d) for d in dirs]
            if not all(os.path.isdir(p) for p in paths):
                cache[key] = None
            elif len(paths) == 1:
                cache[key] = pads.dataset(paths[0], format="parquet")
            else:  # multiple dirs (per-segment tables): union dataset
                cache[key] = pads.dataset(
                    [pads.dataset(p, format="parquet") for p in paths])
        return cache[key]

    @staticmethod
    def _pads_filter(filters):
        """DNF tuple filters -> pyarrow.dataset expression."""
        if not filters:
            return None
        import pyarrow.dataset as pads
        expr = None
        for col, op, val in filters:
            f = pads.field(col)
            if op == "in":
                e = f.isin(list(val))
            elif op == "==":
                e = f == val
            elif op == ">":
                e = f > val
            elif op == ">=":
                e = f >= val
            elif op == "<":
                e = f < val
            elif op == "<=":
                e = f <= val
            else:
                raise ValueError(f"unsupported filter op: {op}")
            expr = e if expr is None else expr & e
        return expr

    def _local_parquet(self, dirs: List[str], filters,
                       columns: List[str]) -> Optional[pd.DataFrame]:
        """Driver-side pyarrow read over index table dir(s), row-group
        pruned.  None when any dir is unreadable locally."""
        try:
            ds = self._local_dataset(dirs)
            if ds is None:
                return None
            return ds.to_table(filter=self._pads_filter(filters),
                               columns=columns).to_pandas()
        except Exception:
            return None

    def _local_postings_blocks(self, pairs) -> Optional[pd.DataFrame]:
        """Posting blocks for (field, term) pairs read driver-side (pyarrow,
        row-group pruned — the files are clustered by field, term, shard).
        None when any postings dir is unreadable locally."""
        dirs = self._stats.get("postings_dirs") or ["postings"]
        fields = sorted({f for f, _ in pairs})
        terms = sorted({t for _, t in pairs})
        filters = [("field", "in", fields), ("term", "in", terms)]
        pdf = self._local_parquet(dirs, filters, self._POSTING_BLOCK_COLS)
        if pdf is None:
            return None
        if len(fields) > 1:
            # isin x isin read a superset; keep the exact pairs only
            # (tuple keys — pandas string concat drops NUL separators)
            key = pd.Series(list(zip(pdf["field"], pdf["term"])),
                            index=pdf.index)
            pdf = pdf[key.isin(set(pairs))].reset_index(drop=True)
        return pdf

    def _local_deletes_ids(self) -> Optional[np.ndarray]:
        """Tombstoned doc_ids read driver-side.  Empty array = no deletes;
        None = a _deletes dir exists but could not be read locally (caller
        must fall back to the cluster path — never silently skip deletes)."""
        path = os.path.join(self.index_dir, "_deletes")
        if not os.path.isdir(path):
            return np.empty(0, dtype=np.int64)
        try:
            import pyarrow.parquet as pq
            t = pq.read_table(path, columns=["doc_id"])
            return t["doc_id"].to_numpy().astype(np.int64)
        except Exception:
            return None

    def _local_sorted_search(self, q: Q.Query, field: str, ascending: bool,
                             offset: int, limit: int) -> Optional[DataFrame]:
        """Local analog of the order_by_field join+sort: merge the matched
        set with the doc-store column and stable-sort (field, doc_id) with
        Spark's null placement (asc -> nulls first, desc -> nulls last).
        Timestamp/date/binary sort columns stay on the cluster path — their
        driver->JVM literal round-trip is timezone/encoding sensitive."""
        docs = self.docs()
        if field not in docs.columns:
            return None  # cluster raises the canonical missing-column error
        sf = docs.schema[field]
        tn = sf.dataType.typeName()
        if tn not in ("long", "integer", "short", "byte", "double", "float",
                      "decimal", "string", "boolean"):
            return None
        local = self._local_search_pdf(q)
        if local is None:
            return None
        if field == "doc_id":  # ordering by the id itself: no merge needed
            merged = local.sort_values("doc_id", ascending=ascending,
                                       kind="mergesort")
        else:
            vals = self._local_parquet(["docs"], None, ["doc_id", field])
            if vals is None:
                return None
            merged = local.merge(vals, on="doc_id", how="inner")
            if merged[field].isna().any():
                # nullable sort values: Spark's null placement plus
                # typed-null literals (float NaN vs integer null) — cluster
                return None
            merged = merged.sort_values(
                [field, "doc_id"], ascending=[ascending, True],
                kind="mergesort")
        rows = merged.iloc[offset:].head(limit) if offset \
            else merged.head(limit)
        tn_conv = {"string": str, "boolean": bool,
                   "double": float, "float": float}.get(tn, int)
        data = [(int(d), float(s), tn_conv(v)) for d, s, v in
                zip(rows["doc_id"], rows["score"], rows[field])]
        schema = T.StructType([T.StructField("doc_id", T.LongType(), False),
                               T.StructField("score", T.DoubleType(), False),
                               sf])
        return self.spark.createDataFrame(data, schema)

    def _local_scored_df(self, pdf: pd.DataFrame) -> DataFrame:
        """(doc_id, score) pandas -> DataFrame backed by a VALUES literal
        (Catalyst LocalRelation): collect() serves it driver-side without
        launching a Spark job, so the fast path stays at native latency
        end-to-end.  repr(float) round-trips IEEE-754 doubles exactly."""
        if len(pdf) == 0:
            return self._empty_scored()
        vals = ", ".join(
            f"(CAST({int(r.doc_id)} AS BIGINT), "
            f"CAST({float(r.score)!r} AS DOUBLE))"
            for r in pdf.itertuples())
        return self.spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(doc_id, score)")

    @staticmethod
    def _empty_pdf() -> pd.DataFrame:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})

    def _local_search_pdf(self, q: Q.Query) -> Optional[pd.DataFrame]:
        """Driver-side evaluation of a whole (already normalized) query:
        pandas frame (doc_id, score), delete-filtered, sorted (score desc,
        doc_id asc).  None = fall back to the Spark paths (non-posix root,
        unsupported node, candidate volume past LOCAL_TOPK_MAX_ROWS, or any
        local read failure).  Every node evaluator mirrors its _score
        counterpart's float64 expression shape and accumulation order, so
        the two paths agree on scores to rounding noise."""
        if fsio.has_scheme(self.index_dir):
            return None
        budget = {"rows": self.LOCAL_TOPK_MAX_ROWS}
        pdf = self._local_eval(q, budget)
        if pdf is None:
            return None
        dels = self._local_deletes_ids()
        if dels is None:
            return None
        if len(dels) and len(pdf):
            pdf = pdf[~pdf["doc_id"].isin(dels)]
        self.last_metrics["local_path"] = 1
        return (pdf.sort_values(["score", "doc_id"],
                                ascending=[False, True], kind="mergesort")
                .reset_index(drop=True))

    def _local_eval(self, q: Q.Query,
                    budget: dict) -> Optional[pd.DataFrame]:
        """Recursive local analog of _score: (doc_id, score) pandas for the
        supported node set, None to fall back.  budget['rows'] is the
        remaining decoded-postings allowance, decremented per leaf."""
        if isinstance(q, Q.Term):
            if self._json_base(q.field) is not None:
                return self._local_eval_json_term(q, budget)
            fm = self._field_meta(q.field)
            if fm.get("type") == "ip":
                from tantivy4java_spark.iptypes import rewrite_ip_query
                rewritten = rewrite_ip_query(q.field, str(q.value))
                if rewritten is None:
                    return self._empty_pdf()
                return self._local_eval_range(rewritten, budget)
            if fm.get("type") not in ("text", "string"):
                # numeric/date/bool term: fast-field equality, const score
                return self._local_docs_filter(q.field, budget,
                                               eq_value=q.value)
            t = self.query_term(q.field, q.value)
            if t is None:
                return self._empty_pdf()
            return self._local_union_bm25([(q.field, t)], budget)
        if isinstance(q, Q.TermSet):
            terms = [self.query_term(q.field, v) for v in q.values]
            pairs = [(q.field, t) for t in terms if t is not None]
            if not pairs:
                return self._empty_pdf()
            return self._local_const_union(pairs, budget)
        if isinstance(q, (Q.Regex, Q.Wildcard)):
            terms = self._local_regex_expansion(q)
            if terms is None:
                return None
            if not terms:
                return self._empty_pdf()
            return self._local_const_union(
                [(q.field, t) for t in terms], budget)
        if isinstance(q, Q.Fuzzy):
            text = self.query_term(q.field, q.text)
            if text is None:
                return self._empty_pdf()
            terms = self._fuzzy_matched_terms(
                q, text, int(q.distance), bool(q.transposition_cost_one))
            if not terms:
                return self._empty_pdf()
            return self._local_union_bm25(
                [(q.field, t) for t in terms], budget)
        if isinstance(q, Q.MatchAll):
            return self._local_all_docs(budget)
        if isinstance(q, Q.Boost):
            child = self._local_eval(q.child, budget)
            if child is None:
                return None
            return child.assign(score=child["score"] * float(q.factor))
        if isinstance(q, Q.ConstScore):
            child = self._local_eval(q.child, budget)
            if child is None:
                return None
            return child.assign(score=float(q.score))
        if isinstance(q, Q.DisMax):
            return self._local_eval_dismax(q, budget)
        if isinstance(q, Q.Boolean):
            return self._local_eval_bool(q, budget)
        if isinstance(q, Q.Phrase):
            return self._local_eval_phrase(q, budget)
        if isinstance(q, Q.Range):
            return self._local_eval_range(q, budget)
        if isinstance(q, Q.Exists):
            return self._local_eval_exists(q, budget)
        return None  # MLT: Spark path

    def _local_scored_rows(self, pairs: List[Tuple[str, str]],
                           idf_map: Dict[Tuple[str, str], float],
                           budget: dict) -> Optional[pd.DataFrame]:
        """Decode + BM25-score the postings of `pairs` driver-side: one row
        per (pair, doc) with columns (doc_id, key, score).  The arithmetic
        mirrors _score_decoded token for token."""
        est = sum(self._df_cache.get(p, self.num_docs + 1) for p in pairs)
        budget["rows"] -= est
        if budget["rows"] < 0:
            return None
        blocks = self._local_postings_blocks(pairs)
        if blocks is None:
            return None
        if len(blocks) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "key": pd.Series([], dtype="object"),
                                 "score": pd.Series([], dtype="float64")})
        decoded = next(_decode_blocks(iter([blocks])))
        # key by (field, term) TUPLES: pandas element-wise string concat
        # silently drops NUL bytes, so the cluster path's "f\x00t" key
        # convention is not safe to replicate here
        key = pd.Series(list(zip(decoded["field"], decoded["term"])),
                        index=decoded.index)
        # plain-dict lookup, NOT Series.map: map(dict) builds a MultiIndex
        # from the tuple keys whose hash engine truncates strings at NUL
        # (json term keys), raising InvalidIndexError on distinct paths
        idf_w = np.fromiter((idf_map[k] for k in key), dtype=np.float64,
                            count=len(key))
        avgdl = decoded["field"].map(
            {f: self.avgdl(f) for f in {p[0] for p in pairs}}
        ).to_numpy(np.float64)
        tf = decoded["tf"].to_numpy().astype(np.float64)
        length = FIELDNORM_TABLE[
            decoded["norm_id"].to_numpy().astype(np.int64)].astype(np.float64)
        # same float64 expression shape as _score_decoded:
        #   idf_w * tf / (tf + K1 * ((1.0 - B) + B * length / avgdl))
        score = idf_w * tf / (tf + K1 * ((1.0 - B) + B * length / avgdl))
        return pd.DataFrame({"doc_id": decoded["doc_id"].to_numpy(np.int64),
                             "key": key.to_numpy(), "score": score})

    def _local_union_bm25(self, pairs: List[Tuple[str, str]],
                          budget: dict) -> Optional[pd.DataFrame]:
        """OR-union of BM25-scored terms (the _score_term /
        _score_multi_term_union analog): per-doc sum over matching terms in
        canonical (doc_id, key) order."""
        idf_map = self._idf_map(pairs)
        if not idf_map:
            return self._empty_pdf()
        d = self._local_scored_rows(list(idf_map), idf_map, budget)
        if d is None:
            return None
        if len(d) == 0:
            return self._empty_pdf()
        d = d.sort_values(["doc_id", "key"], kind="mergesort")
        return (d.groupby("doc_id", sort=True)["score"].sum()
                .reset_index())

    def _local_const_union(self, pairs: List[Tuple[str, str]],
                           budget: dict) -> Optional[pd.DataFrame]:
        """Distinct matching docs at constant score 1.0 (the AutomatonQuery
        const scorer used by termset/regex/wildcard)."""
        dfs = self.term_dfs(pairs)
        live = [p for p in pairs if dfs.get(p, 0) > 0]
        if not live:
            return self._empty_pdf()
        budget["rows"] -= sum(dfs[p] for p in live)
        if budget["rows"] < 0:
            return None
        blocks = self._local_postings_blocks(live)
        if blocks is None:
            return None
        if len(blocks) == 0:
            return self._empty_pdf()
        decoded = next(_decode_blocks(iter([blocks])))
        ids = np.unique(decoded["doc_id"].to_numpy(np.int64))
        return pd.DataFrame({"doc_id": ids,
                             "score": np.ones(len(ids), dtype=np.float64)})

    def _local_all_docs(self, budget: dict) -> Optional[pd.DataFrame]:
        """All doc_ids at constant score 1.0 (MatchAll / the implicit
        AllQuery positive clause of a pure-negative boolean)."""
        budget["rows"] -= self.num_docs
        if budget["rows"] < 0:
            return None
        path = os.path.join(self.index_dir, "docs")
        if not os.path.isdir(path):
            return None
        try:
            import pyarrow.parquet as pq
            ids = pq.read_table(path, columns=["doc_id"])["doc_id"] \
                .to_numpy().astype(np.int64)
        except Exception:
            return None
        return pd.DataFrame({"doc_id": ids,
                             "score": np.ones(len(ids), dtype=np.float64)})

    def _local_regex_expansion(self, q) -> Optional[List[str]]:
        """Driver-side dictionary expansion for regex/wildcard (the
        _regex_expansion analog, Python `re` instead of JVM rlike — the
        engine already spans JVM/DuckDB regex dialects, and wildcard
        patterns are generated from re.escape so they sit in the common
        subset).  None = dictionary not local / too large / pattern does
        not compile -> cluster path."""
        local = self._local_meta("terms", [("field", "==", q.field)],
                                 ["term"])
        if local is None or len(local) > self.MAX_LOCAL_DICT_ROWS:
            return None
        import re
        pattern = q.pattern if isinstance(q, Q.Regex) \
            else Q.wildcard_to_regex(q.pattern)
        flags = ""
        if pattern.startswith("(?i)"):
            flags, pattern = "(?i)", pattern[4:]
        if isinstance(q, Q.Regex) and not pattern.startswith("^"):
            pattern = "^(?:" + pattern + ")$"  # term-anchored (tantivy)
        try:
            rx = re.compile(flags + pattern)
        except re.error:
            return None
        matched = [t for t in local["term"].astype(str) if rx.search(t)]
        if len(matched) > self.MAX_TERM_EXPANSIONS:
            raise ValueError(
                f"pattern expands past {self.MAX_TERM_EXPANSIONS} terms; "
                f"narrow it (wildcard cost model: leading-* patterns are "
                f"expensive — wildcard_analysis.rs:23-96)")
        return matched

    def _local_eval_bool(self, q: Q.Boolean,
                         budget: dict) -> Optional[pd.DataFrame]:
        """The _score_bool analog: same join structure, same fixed-order
        float64 sums (must clause order, should clause order), same msm and
        pure-negative semantics."""
        must, should = list(q.must), list(q.should)
        must_not = list(q.must_not)
        msm = q.minimum_should_match or 0

        base_must = None
        if must:
            frames = []
            for c in must:
                f = self._local_eval(c, budget)
                if f is None:
                    return None
                frames.append(f)
            m = frames[0].rename(columns={"score": "s0"})
            for i, f in enumerate(frames[1:], start=1):
                m = m.merge(f.rename(columns={"score": f"s{i}"}),
                            on="doc_id", how="inner")
            total = m["s0"]
            for i in range(1, len(frames)):
                total = total + m[f"s{i}"]
            base_must = pd.DataFrame({"doc_id": m["doc_id"],
                                      "score": total})
        should_scored = None
        if should:
            frames = []
            for c in should:
                f = self._local_eval(c, budget)
                if f is None:
                    return None
                frames.append(f)
            u = frames[0].rename(columns={"score": "s0"})
            for i, f in enumerate(frames[1:], start=1):
                u = u.merge(f.rename(columns={"score": f"s{i}"}),
                            on="doc_id", how="outer")
            score = u["s0"].fillna(0.0)
            nmatch = u["s0"].notna().astype(int)
            for i in range(1, len(frames)):
                score = score + u[f"s{i}"].fillna(0.0)
                nmatch = nmatch + u[f"s{i}"].notna().astype(int)
            should_scored = pd.DataFrame(
                {"doc_id": u["doc_id"], "score": score, "_n": nmatch})
            if msm > 1:
                should_scored = should_scored[should_scored["_n"] >= msm]

        if base_must is not None and should_scored is not None:
            how = "inner" if msm > 0 else "left"
            j = base_must.rename(columns={"score": "_m"}).merge(
                should_scored[["doc_id", "score"]]
                .rename(columns={"score": "_s"}), on="doc_id", how=how)
            out = pd.DataFrame({"doc_id": j["doc_id"],
                                "score": j["_m"] + j["_s"].fillna(0.0)})
        elif base_must is not None:
            out = base_must
        elif should_scored is not None:
            out = should_scored[["doc_id", "score"]]
        elif must_not:
            out = self._local_all_docs(budget)
            if out is None:
                return None
        else:
            return self._empty_pdf()

        for c in must_not:
            ex = self._local_eval(c, budget)
            if ex is None:
                return None
            if len(ex) and len(out):
                out = out[~out["doc_id"].isin(ex["doc_id"])]
        return out.reset_index(drop=True)

    def _local_eval_phrase(self, q: Q.Phrase,
                           budget: dict) -> Optional[pd.DataFrame]:
        """The _score_phrase analog: positions read driver-side, the SAME
        _phrase_freq_batch kernel computes phrase tf, the same combined-idf
        BM25 expression scores it (json dot-path phrases included — the
        term-key resolution is pure metadata)."""
        jb = self._json_base(q.field)
        if jb is not None:
            from tantivy4java_spark.build import (JSON_PATH_SEP,
                                                  json_query_tokens)
            base, path = jb
            words = []
            for w in q.words:
                words.extend(json_query_tokens(w))
            if not words:
                return self._empty_pdf()
            field = base
            terms = [f"{path}{JSON_PATH_SEP}{w}" for w in words]
        else:
            words = [self.query_term(q.field, w) for w in q.words]
            if any(w is None for w in words) or not words:
                return self._empty_pdf()
            field = q.field
            terms = list(words)
        if len(terms) == 1:
            return self._local_eval(Q.Term(q.field, words[0]), budget)
        uniq = sorted(set(terms))
        dfs = self.term_dfs([(field, t) for t in uniq])
        if any(dfs[(field, t)] == 0 for t in uniq):
            return self._empty_pdf()
        budget["rows"] -= sum(dfs[(field, t)] for t in uniq)
        if budget["rows"] < 0:
            return None
        dirs = self._stats.get("positions_dirs") or ["positions"]
        rows = self._local_parquet(
            dirs, [("field", "==", field), ("term", "in", uniq)],
            ["term", "doc_id", "pos_bin", "norm_id"])
        if rows is None:
            return None
        if len(rows) == 0:
            return self._empty_pdf()
        # pandas object-dtype hash kernels (groupby.nunique, duplicated)
        # truncate strings at NUL — the json path separator — collapsing
        # "<path>\x00a" / "<path>\x00b" into one key.  Group on integer
        # term codes instead; elementwise == compares full strings.
        tvals = rows["term"].to_numpy()
        tcode = np.full(len(rows), -1, dtype=np.int64)
        for i, t in enumerate(uniq):
            tcode[tvals == t] = i
        rows = rows.assign(_tc=tcode)
        cnt = rows.groupby("doc_id")["_tc"].nunique()
        good = cnt[cnt == len(uniq)].index
        if len(good) == 0:
            return self._empty_pdf()
        sub = rows[rows["doc_id"].isin(good)]
        docs = np.sort(good.to_numpy().astype(np.int64))
        pm = {(d, t): b for d, t, b in
              zip(sub["doc_id"].to_numpy(np.int64), sub["term"],
                  sub["pos_bin"])}
        norms = sub.groupby("doc_id")["norm_id"].first()
        bufs_per_term = [[pm[(int(d), t)] for d in docs] for t in terms]
        tf = _phrase_freq_batch(bufs_per_term, int(q.slop)).astype(np.float64)
        keep = tf > 0
        if not keep.any():
            return self._empty_pdf()
        docs = docs[keep]
        tf = tf[keep]
        length = FIELDNORM_TABLE[
            norms.loc[docs].to_numpy().astype(np.int64)].astype(np.float64)
        idf_w = sum(idf_weight(dfs[(field, t)], self.num_docs)
                    for t in terms)
        avgdl = self.avgdl(field)
        # same float64 expression shape as _score_phrase's Column expr
        score = idf_w * tf / (tf + K1 * ((1.0 - B) + B * length / avgdl))
        return pd.DataFrame({"doc_id": docs, "score": score})

    def _local_eval_json_term(self, q: Q.Term,
                              budget: dict) -> Optional[pd.DataFrame]:
        """The _score_term json-path analog: BM25 sum over the value's path
        tokens, multi-token values require ALL tokens under the path (the
        same full-text AND lowering)."""
        from tantivy4java_spark.build import JSON_PATH_SEP, json_query_tokens
        base, path = self._json_base(q.field)
        toks = json_query_tokens(q.value)
        if not toks:
            return self._empty_pdf()
        terms = [f"{path}{JSON_PATH_SEP}{t}" for t in dict.fromkeys(toks)]
        idf_map = self._idf_map([(base, t) for t in terms])
        if len(idf_map) < len(terms):
            return self._empty_pdf()  # any missing token -> no match
        d = self._local_scored_rows(list(idf_map), idf_map, budget)
        if d is None:
            return None
        if len(d) == 0:
            return self._empty_pdf()
        d = d.sort_values(["doc_id", "key"], kind="mergesort")
        g = d.groupby("doc_id", sort=True)
        out = g["score"].sum().reset_index()
        if len(terms) > 1:
            # nunique over TUPLE keys (PyObject hashing) — never the raw
            # NUL-separated term strings (see _local_eval_phrase)
            out = out[g["key"].nunique().to_numpy() == len(terms)]
        return out.reset_index(drop=True)

    def _local_docs_filter(self, field: str, budget: dict, eq_value=None,
                           rng: Optional[Q.Range] = None,
                           ip_bounds: Optional[Tuple] = None,
                           col: Optional[str] = None,
                           ) -> Optional[pd.DataFrame]:
        """Constant-score docs-table filter read driver-side with the range
        predicate pushed into the pyarrow scan (row-group pruned), the
        _score_range / typed-term analog.  Bounds are lowered with the SAME
        _coerce_typed_bound as the cluster expression, against the Spark
        schema dtype (metadata only — no job)."""
        docs = self.docs()
        cols = docs.columns
        col = col or field
        if col not in cols:
            return None  # cluster path raises the canonical error
        budget["rows"] -= self.num_docs
        if budget["rows"] < 0:
            return None

        def _align(v):
            # Spark writes timestamp columns as INT96 by default, which
            # pyarrow reads as tz-NAIVE timestamp[ns] even though the stored
            # values are UTC instants — a tz-aware bound then has no
            # comparison kernel.  Align the bound to the arrow column's
            # tz-ness; the instant is unchanged either way.
            import datetime as _dtm
            if isinstance(v, _dtm.datetime) and v.tzinfo is not None:
                at = self._local_arrow_type("docs", col)
                if at is not None and getattr(at, "tz", None) is None:
                    return v.astimezone(_dtm.timezone.utc).replace(tzinfo=None)
            return v

        filters = []
        if eq_value is not None:
            val = _coerce_typed_bound(eq_value, dict(docs.dtypes).get(col, ""))
            filters.append((col, "==", _align(val)))
        elif ip_bounds is not None:
            lo, hi, incl_lo, incl_hi = ip_bounds
            if lo is not None:
                filters.append((col, ">=" if incl_lo else ">", lo))
            if hi is not None:
                filters.append((col, "<=" if incl_hi else "<", hi))
        elif rng is not None:
            dtype = dict(docs.dtypes).get(col, "")
            lo = _coerce_typed_bound(rng.lower, dtype)
            hi = _coerce_typed_bound(rng.upper, dtype)
            if lo is not None:
                filters.append((col, ">=" if rng.include_lower else ">",
                                _align(lo)))
            if hi is not None:
                filters.append((col, "<=" if rng.include_upper else "<",
                                _align(hi)))
        pdf = self._local_parquet(["docs"], filters or None, ["doc_id"])
        if pdf is None:
            return None
        ids = pdf["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": ids,
                             "score": np.ones(len(ids), dtype=np.float64)})

    def _local_arrow_type(self, table: str, col: str):
        """Arrow type of `col` in an index table dir (memoized; None when
        unreadable locally)."""
        key = (table, col)
        if key not in self._arrow_types:
            try:
                import pyarrow.dataset as ds
                sch = ds.dataset(os.path.join(self.index_dir, table),
                                 format="parquet").schema
                self._arrow_types[key] = sch.field(col).type
            except Exception:
                self._arrow_types[key] = None
        return self._arrow_types[key]

    def _local_eval_range(self, q: Q.Range,
                          budget: dict) -> Optional[pd.DataFrame]:
        """The _score_range analog: json paths expand matching numeric terms
        from the local dictionary (capped) into a const union; ip/typed
        fields push the coerced bounds into a local docs-table scan."""
        jb = self._json_base(q.field)
        if jb is not None:
            from tantivy4java_spark.build import JSON_PATH_SEP
            base, path = jb
            prefix = f"{path}{JSON_PATH_SEP}"
            t = self._local_meta("terms", [("field", "==", base)], ["term"])
            if t is None or len(t) > self.MAX_LOCAL_DICT_ROWS:
                return None
            sub = t[t["term"].str.startswith(prefix)]
            vals = pd.to_numeric(sub["term"].str[len(prefix):],
                                 errors="coerce")
            m = vals.notna()
            if q.lower is not None:
                lv = float(q.lower)
                m &= (vals >= lv) if q.include_lower else (vals > lv)
            if q.upper is not None:
                uv = float(q.upper)
                m &= (vals <= uv) if q.include_upper else (vals < uv)
            matched = list(sub["term"][m])
            if not matched:
                return self._empty_pdf()
            return self._local_const_union([(base, t_) for t_ in matched],
                                           budget)
        fm = self._field_meta(q.field)
        if fm.get("type") == "ip":
            from tantivy4java_spark.iptypes import ip_to_hex
            lo = ip_to_hex(str(q.lower)) if q.lower is not None else None
            hi = ip_to_hex(str(q.upper)) if q.upper is not None else None
            return self._local_docs_filter(
                q.field, budget,
                ip_bounds=(lo, hi, q.include_lower, q.include_upper),
                col=f"_ipnum_{q.field}")
        return self._local_docs_filter(q.field, budget, rng=q)

    def _local_eval_exists(self, q: Q.Exists,
                           budget: dict) -> Optional[pd.DataFrame]:
        """The existsQuery analog: json paths union every term under the
        path prefix; tokenized text fields test len_<field> > 0; typed
        fields test column not-null."""
        jb = self._json_base(q.field)
        if jb is not None:
            from tantivy4java_spark.build import JSON_PATH_SEP
            base, path = jb
            prefix = f"{path}{JSON_PATH_SEP}" if path else ""
            t = self._local_meta("terms", [("field", "==", base)], ["term"])
            if t is None or len(t) > self.MAX_LOCAL_DICT_ROWS:
                return None
            matched = list(t["term"][t["term"].str.startswith(prefix)]) \
                if prefix else list(t["term"])
            if not matched:
                return self._empty_pdf()
            return self._local_const_union([(base, t_) for t_ in matched],
                                           budget)
        docs = self.docs()
        cols = docs.columns
        if q.field not in cols and f"len_{q.field}" in cols:
            budget["rows"] -= self.num_docs
            if budget["rows"] < 0:
                return None
            pdf = self._local_parquet(["docs"], [(f"len_{q.field}", ">", 0)],
                                      ["doc_id"])
            if pdf is None:
                return None
            ids = pdf["doc_id"].to_numpy(np.int64)
            return pd.DataFrame({"doc_id": ids,
                                 "score": np.ones(len(ids),
                                                  dtype=np.float64)})
        if q.field not in cols:
            return None  # cluster path raises the canonical error
        budget["rows"] -= self.num_docs
        if budget["rows"] < 0:
            return None
        pdf = self._local_parquet(["docs"], None, ["doc_id", q.field])
        if pdf is None:
            return None
        ids = pdf.loc[pdf[q.field].notna(), "doc_id"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": ids,
                             "score": np.ones(len(ids), dtype=np.float64)})

    def _local_eval_dismax(self, q: Q.DisMax,
                           budget: dict) -> Optional[pd.DataFrame]:
        """The _score_dismax analog: max + tie_breaker * (sum - max) over a
        full-outer union, coalesced in clause order."""
        frames = []
        for c in q.queries:
            f = self._local_eval(c, budget)
            if f is None:
                return None
            frames.append(f)
        u = frames[0].rename(columns={"score": "s0"})
        for i, f in enumerate(frames[1:], start=1):
            u = u.merge(f.rename(columns={"score": f"s{i}"}),
                        on="doc_id", how="outer")
        cols = [u[f"s{i}"].fillna(0.0) for i in range(len(frames))]
        mx = cols[0]
        for c in cols[1:]:
            mx = np.maximum(mx, c)
        total = cols[0]
        for c in cols[1:]:
            total = total + c
        score = mx + float(q.tie_breaker) * (total - mx)
        return pd.DataFrame({"doc_id": u["doc_id"], "score": score})

    def _scored_pruned(self, mode: str, pairs: List[Tuple[str, str]],
                       k: int) -> DataFrame:
        idf_map = self._idf_map(pairs)
        if not idf_map:
            return self._empty_scored()
        if mode == "and" and len(idf_map) < len(set(pairs)):
            # a MUST term with df=0 empties the whole intersection — it must
            # NOT silently drop out of the AND
            return self._empty_scored()
        pairs = list(idf_map.keys())
        fields = sorted({f for f, _ in pairs})
        terms = sorted({t for _, t in pairs})
        # The per-(term, shard) bound rows are collected to the driver for
        # phase selection.  That is fine while terms x touched-shards stays
        # small, but a high-df term over a 10^12-doc index touches millions
        # of shards — estimate the volume from the cached term dfs (an upper
        # bound: a term cannot touch more shards than docs, nor more than
        # exist) and switch to the all-cluster-side phases above the cap.
        total_shards_ub = max(1, self.num_docs >> self._meta.get("shard_bits", 16))
        est_rows = sum(min(self._df_cache.get(p, self.num_docs), total_shards_ub)
                       for p in pairs)
        if est_rows > self.MAX_DRIVER_SHARD_ROWS:
            return self._scored_pruned_cluster(mode, pairs, idf_map, k)
        # shard bounds come from the tiny blockmeta table when present (the
        # metadata-only-merge layout); legacy indexes aggregate the postings
        # rows' embedded block_max column
        meta_table = "blockmeta" if self.blockmeta() is not None else "postings"
        local = self._local_meta(
            meta_table, [("field", "in", fields), ("term", "in", terms)],
            ["field", "term", "shard", "count", "block_max_score"])
        if local is not None:
            agg = (local.groupby(["field", "term", "shard"], as_index=False)
                   .agg(cnt=("count", "sum"), bmax=("block_max_score", "max")))
            meta_rows = list(agg.itertuples(index=False))
            meta = [(r.field, r.term, int(r.shard), int(r.cnt), float(r.bmax))
                    for r in meta_rows if (r.field, r.term) in idf_map]
        else:
            src = self.blockmeta()
            if src is None:
                src = self.postings()
            meta_rows = (src
                         .filter(F.col("field").isin(fields) & F.col("term").isin(terms))
                         .groupBy("field", "term", "shard")
                         .agg(F.sum("count").alias("cnt"),
                              F.max("block_max_score").alias("bmax"))
                         .collect())
            meta = [(r["field"], r["term"], int(r["shard"]), int(r["cnt"]), float(r["bmax"]))
                    for r in meta_rows if (r["field"], r["term"]) in idf_map]
        shards: Dict[int, dict] = {}
        for fld, trm, sh, cnt, bmax in meta:
            s = shards.setdefault(sh, {"bound": 0.0, "cnt": 0, "terms": set()})
            s["bound"] += bmax
            s["cnt"] += cnt
            s["terms"].add((fld, trm))
        if mode == "and":
            shards = {sh: s for sh, s in shards.items()
                      if len(s["terms"]) == len(pairs)}
        total_shards = len(shards)
        self.last_metrics["shards_total"] = total_shards
        if not shards:
            return self._empty_scored()

        def scored_for(shard_ids: Sequence[int],
                       min_block_max: Optional[float] = None) -> DataFrame:
            decoded = self._decoded_postings(
                pairs, shards=shard_ids,
                min_block_max=min_block_max if len(pairs) == 1 else None)
            scored = self._score_decoded(decoded, idf_map)
            if mode == "and":
                agg = (scored.groupBy("doc_id")
                       .agg(F.sum("score").alias("score"),
                            F.countDistinct("field", "term").alias("_n"))
                       .filter(F.col("_n") == len(pairs)))
                scored = agg.select("doc_id", "score")
            else:
                scored = scored.groupBy("doc_id").agg(F.sum("score").alias("score"))
            # deletes MUST apply before the phase-1 threshold is collected:
            # a deleted doc inflating the threshold would wrongly prune shards
            # holding live top-k docs (and the len(top1)<k fallback must count
            # live docs only).
            return self._apply_deletes(scored)

        order = sorted(shards.items(), key=lambda kv: -kv[1]["bound"])
        phase1, cum = [], 0
        for sh, s in order:
            phase1.append(sh)
            cum += s["cnt"]
            if cum >= k:
                break
        if len(phase1) == total_shards:
            self.last_metrics["shards_scored"] = total_shards
            return scored_for(phase1)
        top1 = scored_for(phase1).orderBy(F.desc("score"), F.asc("doc_id")) \
            .limit(k).collect()
        if len(top1) < k:
            self.last_metrics["shards_scored"] = total_shards
            return scored_for(list(shards.keys()))
        threshold = top1[-1]["score"]
        survivors = [sh for sh, s in shards.items() if s["bound"] >= threshold]
        self.last_metrics["shards_scored"] = len(survivors)
        self.last_metrics["wand_threshold"] = threshold
        # single-term: additionally skip individual blocks below the threshold
        return scored_for(survivors, min_block_max=threshold)

    def _scored_pruned_cluster(self, mode: str,
                               pairs: List[Tuple[str, str]],
                               idf_map: Dict[Tuple[str, str], float],
                               k: int) -> DataFrame:
        """Same two-phase shard WAND, but the bound table never leaves the
        cluster: phase-1 shard selection collects only a bounded prefix of
        the per-shard bounds, and the phase-2 survivor set prunes the scan
        via a broadcast semi-join instead of an isin literal.  The algorithm
        (and its oracle-checked results) are identical to the driver-side
        path; only the data movement changes."""
        fields = sorted({f for f, _ in pairs})
        terms = sorted({t for _, t in pairs})
        cond = F.col("field").isin(fields) & F.col("term").isin(terms)
        if len(fields) > 1:
            pk = F.concat_ws("\x00", F.col("field"), F.col("term"))
            cond = cond & pk.isin([f + "\x00" + t for f, t in pairs])
        src = self.blockmeta()
        if src is None:
            src = self.postings()
        bounds = (src.filter(cond)
                  .groupBy("field", "term", "shard")
                  .agg(F.sum("count").alias("cnt"),
                       F.max("block_max_score").alias("bmax"))
                  .groupBy("shard")
                  .agg(F.sum("bmax").alias("bound"),
                       F.sum("cnt").alias("cnt"),
                       F.countDistinct("field", "term").alias("_nterms")))
        if mode == "and":
            bounds = bounds.filter(F.col("_nterms") == len(pairs))
        # no persist: the result is consumed lazily by the caller, and the
        # bounds frame is a cheap metadata aggregation (blockmeta is tiny
        # relative to postings) — evaluating it twice beats leaking cache
        bounds = bounds.select("shard", "bound", "cnt")
        self.last_metrics["shards_total"] = -1  # not enumerated (by design)

        def scored_for(shards_df: DataFrame,
                       min_block_max: Optional[float] = None) -> DataFrame:
            decoded = self._decoded_postings(
                pairs, shards_df=shards_df,
                min_block_max=min_block_max if len(pairs) == 1 else None)
            scored = self._score_decoded(decoded, idf_map)
            if mode == "and":
                agg = (scored.groupBy("doc_id")
                       .agg(F.sum("score").alias("score"),
                            F.countDistinct("field", "term").alias("_n"))
                       .filter(F.col("_n") == len(pairs)))
                scored = agg.select("doc_id", "score")
            else:
                scored = scored.groupBy("doc_id") \
                    .agg(F.sum("score").alias("score"))
            return self._apply_deletes(scored)

        # phase 1: a bounded prefix of the best-bound shards is enough to
        # seed the threshold (each shard holds >= 1 posting, so 4k rows
        # cover any sane k); collect ONLY that prefix
        prefix = (bounds.orderBy(F.desc("bound"), F.asc("shard"))
                  .limit(max(64, 4 * k)).collect())
        phase1, cum = [], 0
        for r in prefix:
            phase1.append(int(r["shard"]))
            cum += int(r["cnt"])
            if cum >= k:
                break
        if not phase1:
            return self._empty_scored()
        p1_df = self.spark.createDataFrame(
            [(s,) for s in phase1], "shard long")
        top1 = (scored_for(p1_df)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k).collect())
        if len(top1) < k:
            # fewer than k hits in the best shards: score everything the
            # bounds table covers (no threshold to prune with)
            self.last_metrics["shards_scored"] = -1
            return scored_for(bounds)
        threshold = top1[-1]["score"]
        survivors = bounds.filter(F.col("bound") >= F.lit(threshold))
        self.last_metrics["wand_threshold"] = threshold
        self.last_metrics["shards_scored"] = -1
        return scored_for(survivors, min_block_max=threshold)

    # -- doc retrieval (S14 analog: join hits back to the doc store) ---------------
    def retrieve(self, hits: DataFrame, source: DataFrame,
                 on: str = "doc_id", fields: Optional[List[str]] = None) -> DataFrame:
        """Fetch stored fields for hits: broadcast the SMALL side (the top-k
        hit set) into a scan of the doc store — the broadcast hash join plus
        Parquet row-group pruning is the range-consolidation analog of the
        reference's batch retrieval (O7)."""
        cols = fields or [c for c in source.columns if c != on]
        sel = source.select(on, *cols)
        return sel.join(F.broadcast(hits), on, "inner") \
            .select(*hits.columns, *cols)

    def count(self, q: Q.Query) -> int:
        """Hit count without materializing scores order (bulk count path —
        the reference's 45ms unscored search analog).  Takes the driver-side
        fast path when the whole query evaluates locally (zero Spark jobs)."""
        q = Q.normalize(q)
        if not fsio.has_scheme(self.index_dir):
            pdf = self._local_search_pdf(q)
            if pdf is not None:
                return len(pdf)
        return self.score_query(q).count()

    # -- prewarm (§2.6: preloadComponents/preloadFields analog) -----------------
    def preload(self, components: Optional[Sequence[str]] = None) -> None:
        """Pin index tables in executor memory (Spark block-manager cache —
        replaces the reference's L1/L2 cache machinery,
        split/SplitSearcher.java:1129-1196).  Default set: terms + postings,
        plus positions when any field is position-indexed (phrase queries
        then always hit the pinned frame — positions() is memoized)."""
        if components is None:
            components = ["terms", "postings"]
            from tantivy4java_spark.schema import INDEX_POSITION
            if any(f.get("index_option") == INDEX_POSITION
                   for f in self._meta.get("fields", [])):
                components.append("positions")
        accessors = {"postings": self.postings, "positions": self.positions,
                     "docs": self.docs, "blockmeta": self.blockmeta}
        to_pin = []
        for name in components:
            df = accessors[name]() if name in accessors else self._table(name)
            if df is None:  # blockmeta on legacy indexes
                continue
            to_pin.append(df.cache())
        # distinct tables -> independent materialize jobs; run them
        # concurrently so the pin wall time is the slowest table, not the sum
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=max(1, len(to_pin))) as ex:
            for f in [ex.submit(df.count) for df in to_pin]:
                f.result()

    def warmup_query(self, q: Q.Query) -> None:
        """warmupQuery analog (split/SplitSearcher.java:1306)."""
        self.search(q, limit=1).collect()


def _coerce_typed_bound(v, dtype: str):
    """Lower a query bound against the actual fast-column dtype (the
    schema-aware half of typed DATE handling; SchemaBuilder.java:234-247):
    timestamp columns accept ISO strings / datetimes at microsecond
    precision; string columns get datetimes (from an over-eager parse)
    rendered back to ISO text; date columns accept dates."""
    if v is None:
        return None
    import datetime as _dtm
    if dtype.startswith("timestamp"):
        # DATE semantics are UTC-anchored (DateMicrosecondPrecisionTest).
        # For TIMESTAMP (with-local-tz) columns the bound MUST stay tz-aware:
        # PySpark anchors naive datetime literals to the driver/session
        # timezone, so a naive-UTC bound returns wrong docs on any non-UTC
        # driver.  TIMESTAMP_NTZ columns are wall-clock values — those take
        # the naive-UTC form instead.
        ntz = dtype == "timestamp_ntz"

        def _anchor(dt: _dtm.datetime):
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=_dtm.timezone.utc)
            dt = dt.astimezone(_dtm.timezone.utc)
            return dt.replace(tzinfo=None) if ntz else dt

        if isinstance(v, _dtm.datetime):
            return _anchor(v)
        if isinstance(v, _dtm.date):
            return _anchor(_dtm.datetime(v.year, v.month, v.day))
        if isinstance(v, str):
            from tantivy4java_spark.parser import parse_iso_datetime
            dt = parse_iso_datetime(v)
            if dt is None:
                raise ValueError(f"not an ISO datetime bound: {v!r}")
            return _anchor(dt)
        return v
    if dtype == "date":
        if isinstance(v, _dtm.datetime):
            return v.date()
        if isinstance(v, str):
            from tantivy4java_spark.parser import parse_iso_datetime
            dt = parse_iso_datetime(v)
            if dt is None:
                raise ValueError(f"not an ISO date bound: {v!r}")
            return dt.date()
        return v
    if dtype == "string" and isinstance(v, (_dtm.datetime, _dtm.date)):
        return v.isoformat()
    if dtype == "binary":
        # BYTES fields (SchemaBuilder.java:350-363): binary fast column;
        # hex strings are accepted as a convenience spelling
        if isinstance(v, (bytes, bytearray, memoryview)):
            return bytes(v)
        if isinstance(v, str):
            return bytes.fromhex(v)
    return v


def _edit_distance(a: str, b: str, cap: int, osa: bool) -> int:
    """Levenshtein / OSA (transposition cost 1) with early cutoff."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if osa and i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        if min(cur) > cap:
            return cap + 1
        prev2, prev = prev, cur
    return prev[lb]


def _osa_within_batch(query: str, terms, cap: int,
                      osa: bool = True) -> np.ndarray:
    """OSA (or, with osa=False, classic Levenshtein) edit distance <= cap for
    a whole candidate batch, vectorized over the batch dimension: the DP
    visits len(query) x max_term_len cells, each cell ONE numpy op across
    all terms (pinned against the scalar _edit_distance in tests).  The
    length prefilter upstream bounds max_term_len to len(query)+cap, so the
    cell count stays tiny."""
    n = len(terms)
    if n == 0:
        return np.zeros(0, dtype=bool)
    qa = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    la = qa.size
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    total = int(lens.sum())
    maxlen = int(lens.max()) if n else 0
    M = np.zeros((n, maxlen), dtype=np.uint32)  # 0 == never-matching pad
    if total:
        flat = np.frombuffer("".join(terms).encode("utf-32-le"),
                             dtype=np.uint32)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        cols = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        M[rows, cols] = flat
    prev2 = None
    prev = np.tile(np.arange(maxlen + 1, dtype=np.int64), (n, 1))
    for i in range(1, la + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        for j in range(1, maxlen + 1):
            cost = (M[:, j - 1] != qa[i - 1]).astype(np.int64)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost)
            if osa and i > 1 and j > 1:
                trans = (qa[i - 1] == M[:, j - 2]) & (qa[i - 2] == M[:, j - 1])
                cur[:, j] = np.where(
                    trans, np.minimum(cur[:, j], prev2[:, j - 2] + 1),
                    cur[:, j])
        prev2, prev = prev, cur
    return prev[np.arange(n), lens] <= cap


def _decode_positions_concat(bufs) -> "tuple[np.ndarray, np.ndarray]":
    """Decode MANY per-doc delta-varint position buffers in one vectorized
    pass.  Returns (values, counts): the flat decoded positions and the
    per-buffer value count.  Replaces a per-doc Python decode loop — the
    varint decode, the per-buffer cumsum reset, and the count split are all
    numpy array ops over the concatenated bytes."""
    n = len(bufs)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    blens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    concat = b"".join(bufs)
    if not concat:
        return np.zeros(0, np.int64), np.zeros(n, np.int64)
    raw = np.frombuffer(concat, dtype=np.uint8)
    is_term = raw < 0x80  # varint terminal bytes: one per value
    total = int(is_term.sum())
    gaps = codec.varint_decode(concat, total).astype(np.int64)
    ends = np.cumsum(blens)
    # cum[i] = values within the first i bytes (cum[0]=0), so per-buffer
    # counts are exact differences — robust to EMPTY buffers anywhere
    # (indexing vals_upto[ends-1] would wrap ends[j]-1 == -1 for a leading
    # empty buffer and mis-assign the whole split)
    cum = np.concatenate([[0], np.cumsum(is_term)])
    counts = cum[ends] - cum[np.concatenate([[0], ends[:-1]])]
    # per-buffer cumsum: global cumsum minus the running total before each
    # buffer's first value (same trick as codec.decode_blocks_concat)
    c = np.cumsum(gaps)
    vstart = np.concatenate([[0], np.cumsum(counts)[:-1]])
    safe = np.minimum(vstart, max(total - 1, 0))
    base = np.repeat(c[safe] - gaps[safe], counts)
    return c - base, counts


def _phrase_freq_batch(bufs_per_term, slop: int) -> np.ndarray:
    """Per-doc phrase frequency for a whole Arrow batch in one numpy sweep.

    Positions of doc d are lifted to d*2^32 + pos, so every doc's sorted
    stream concatenates into ONE globally sorted array per phrase slot and a
    single searchsorted advances all anchors of all docs together.  A
    "next" position that falls in a different doc lands >= 2^32 away, so
    the slop bound kills that lane automatically — no per-doc masking.
    Same match semantics as _phrase_freq (the scalar single-doc reference,
    pinned against it in tests)."""
    ndocs = len(bufs_per_term[0])
    if ndocs == 0:
        return np.zeros(0, np.int64)
    LIFT = np.int64(1) << np.int64(32)
    lifted = []
    for bufs in bufs_per_term:
        vals, counts = _decode_positions_concat(bufs)
        docidx = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
        lifted.append(vals + docidx * LIFT)
    p0 = lifted[0]
    if slop == 0:
        anchors = p0
        for i, arr in enumerate(lifted[1:], start=1):
            anchors = anchors[np.isin(anchors + i, arr)]
            if anchors.size == 0:
                return np.zeros(ndocs, np.int64)
        return np.bincount(anchors >> 32, minlength=ndocs).astype(np.int64)
    prev = p0.copy()
    budget_used = np.zeros_like(p0)
    alive = np.ones(p0.shape, dtype=bool)
    for i, arr in enumerate(lifted[1:], start=1):
        idx = np.searchsorted(arr, prev + 1, side="left")
        has = idx < arr.size
        nxt = arr[np.minimum(idx, max(arr.size - 1, 0))] if arr.size \
            else np.zeros_like(prev)
        excess = nxt - p0 - i
        step_ok = has & (budget_used + excess <= slop)
        alive &= step_ok
        if not alive.any():
            return np.zeros(ndocs, np.int64)
        budget_used = np.where(step_ok, budget_used + excess, budget_used)
        prev = np.where(step_ok, nxt, prev)
    return np.bincount(p0[alive] >> 32, minlength=ndocs).astype(np.int64)


def _phrase_freq(arrays: List[np.ndarray], slop: int) -> int:
    """Number of phrase matches: ordered positions q_0<...<q_{n-1} with total
    extra gap sum(q_i - q_0 - i) <= slop; counts distinct anchors q_0."""
    if any(a.size == 0 for a in arrays):
        return 0
    if slop == 0:
        anchors = arrays[0]
        for i, arr in enumerate(arrays[1:], start=1):
            anchors = anchors[np.isin(anchors + i, arr)]
            if anchors.size == 0:
                return 0
        return int(anchors.size)
    # slop>0: all anchors advance together, one searchsorted per phrase term
    # (positions are sorted: codec.decode_positions is a cumsum of gaps).
    # Greedy minimal-next is optimal: picking the smallest feasible q_i
    # minimizes q_i itself AND every later choice, hence minimizes the
    # CUMULATIVE moves sum — if the greedy sequence busts the budget, no
    # assignment for this anchor satisfies it.  budget_used accumulates
    # each term's excess (Lucene total-moves: moving token i left by
    # q_i - q_0 - i positions costs that many moves).
    p0 = arrays[0].astype(np.int64)
    prev = p0.copy()
    budget_used = np.zeros_like(p0)
    alive = np.ones(p0.shape, dtype=bool)
    for i, arr in enumerate(arrays[1:], start=1):
        idx = np.searchsorted(arr, prev + 1, side="left")
        has = idx < arr.size
        nxt = arr[np.minimum(idx, arr.size - 1)]
        excess = nxt - p0 - i
        step_ok = has & (budget_used + excess <= slop)
        alive &= step_ok
        if not alive.any():
            return 0
        budget_used = np.where(step_ok, budget_used + excess, budget_used)
        prev = np.where(step_ok, nxt, prev)
    return int(np.count_nonzero(alive))
