"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design:
- exact: one hash-groupBy, no data movement beyond the shuffle on the digest.
- MinHash+LSH: signatures are computed per-row (narrow); the only shuffle is
  the band-bucket self-join, whose keys are (band_id, band_hash) — uniformly
  distributed by construction, no skew.  Candidate pairs are verified with
  exact shingle Jaccard before being declared duplicates (no false positives
  leave the operator).
- The MinHash hash family is min(md5(i || shingle)) over the lexicographic
  order of hex digests — a valid permutation family that is reproducible in
  ANY engine with md5 (this is what makes the DuckDB oracle exact).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup(df: DataFrame, col: str, id_col: str,
                keep: str = "min") -> DataFrame:
    """Keep one representative per exact content (sha256) group."""
    digest = F.sha2(F.col(col).cast("string"), 256)
    w = Window.partitionBy(digest).orderBy(
        F.asc(id_col) if keep == "min" else F.desc(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def shingles_col(col, k: int = 3):
    """k-word shingles (space-joined), distinct."""
    toks = F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(
        " ", F.slice(toks, i + 1, k)))
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(F.array()))


def minhash_signature(col, num_hashes: int = 16, k: int = 3):
    """array<string> of length num_hashes: min over shingles of
    md5(<i>|shingle) — engine-portable MinHash."""
    sh = shingles_col(col, k)
    return F.array(*[
        F.array_min(F.transform(
            sh, lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))))
        for i in range(num_hashes)])


def minhash_dedup_pairs(df: DataFrame, col: str, id_col: str,
                        num_hashes: int = 16, bands: int = 4, k: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH banding + exact Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    base = df.select(F.col(id_col).alias("_id"),
                     minhash_signature(F.col(col), num_hashes, k).alias("_sig"),
                     shingles_col(F.col(col), k).alias("_sh"))
    # ONLY (id, band, bhash) rides through the band-bucket shuffle — the
    # full shingle arrays would multiply the shuffle bytes by the band
    # count; they are re-attached AFTER candidate-pair dedup (a narrow
    # recompute + an id-keyed join that AQE broadcasts when small).
    band_rows = base.select(
        "_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws("", F.slice(F.col("_sig"),
                                             b * rows_per_band + 1,
                                             rows_per_band)).alias("bhash"))
            for b in range(bands)])).alias("bb"))
    band_rows = band_rows.select("_id", F.col("bb.band").alias("band"),
                                 F.col("bb.bhash").alias("bhash"))
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cand_ids = (a.join(b, ["band", "bhash"])
                .filter(F.col("a._id") < F.col("b._id"))
                .select(F.col("a._id").alias("id_a"),
                        F.col("b._id").alias("id_b"))
                .dropDuplicates(["id_a", "id_b"]))
    sh = base.select("_id", "_sh")
    cand = (cand_ids
            .join(sh.select(F.col("_id").alias("id_a"),
                            F.col("_sh").alias("sh_a")), "id_a")
            .join(sh.select(F.col("_id").alias("id_b"),
                            F.col("_sh").alias("sh_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    # filter on the RAW value, round only for display (keeps threshold
    # semantics identical to any re-implementation, e.g. the SQL oracle)
    return (cand.withColumn("_rawj", jac)
            .filter(F.col("_rawj") >= threshold)
            .select("id_a", "id_b", F.round("_rawj", 6).alias("jaccard")))


def ngram_jaccard_pairs(df: DataFrame, col: str, id_col: str, k: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: Optional[int] = None) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via an inverted shingle join
    (|A∩B| per pair from one groupBy, sizes joined back) — never a cross
    join; the shuffle key is the shingle.

    ``max_shingle_df``: drop shingles occurring in more than this many docs
    BEFORE the pair join — the stopword-shingle cap that prevents the
    quadratic candidate blowup at corpus scale.  The intersection count then
    undercounts pairs that share only dropped shingles, so results become a
    high-precision LOWER bound on Jaccard (duplicates at sane thresholds
    share plenty of rare shingles); None = exact."""
    sh = (df.select(F.col(id_col).alias("_id"),
                    F.explode(shingles_col(F.col(col), k)).alias("sh")))
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    if max_shingle_df is not None:
        rare = (sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
                .filter(F.col("_df") <= max_shingle_df).select("sh"))
        sh = sh.join(rare, "sh")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, "sh").filter(F.col("a._id") < F.col("b._id"))
             .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    out = (inter
           .join(sizes.withColumnRenamed("_id", "id_a")
                 .withColumnRenamed("n", "n_a"), "id_a")
           .join(sizes.withColumnRenamed("_id", "id_b")
                 .withColumnRenamed("n", "n_b"), "id_b"))
    jac = (F.col("inter").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"))
    return (out.withColumn("_rawj", jac)
            .filter(F.col("_rawj") >= threshold)
            .select("id_a", "id_b", F.round("_rawj", 6).alias("jaccard")))


def simhash(df: DataFrame, col: str, id_col: str,
            out: str = "simhash") -> DataFrame:
    """64-bit SimHash over whitespace tokens weighted by tf — pure Catalyst
    (whole-stage codegen end to end, no Python in the hot path).

    Bit source: the first 16 hex chars of ``md5(token)`` — an engine-portable
    hash family any SQL engine can replay exactly (this is what makes the
    driver's DuckDB oracle possible).  Bit j of a token = bit ``j % 16`` of
    the 16-bit chunk parsed from hex chars ``[4*(j//16)+1 .. 4*(j//16)+4]``.

    Plan shape at scale: ONE narrow per-row projection — the 64 bit votes
    are summed inside a SQL ``aggregate`` higher-order function over the
    token array, so there is NO explode, NO shuffle and NO join-back.  (The
    previous formulation exploded tokens, shuffled 64 vote longs per doc
    through a groupBy on the id, and sort-merge-joined the signature back to
    ``df`` — a second full scan of the input; measured 3x slower at 1M docs
    and strictly worse at scale.  Values are bit-identical — pinned by tests
    and the DuckDB oracle.)  Docs with no tokens get simhash 0.
    """
    votes = F.expr(f"""
      aggregate(
        transform(
          filter(split(cast(`{col}` as string), '\\\\s+'), t -> t != ''),
          t -> transform(sequence(0, 3),
                k -> cast(conv(substring(md5(t), k * 4 + 1, 4), 16, 10)
                          as long))),
        array_repeat(0, 64),
        (acc, ch) -> zip_with(acc, sequence(0, 63),
          (a, j) -> a + (cast(shiftright(element_at(ch, cast(j / 16 as int)
                                                        + 1),
                                         cast(j % 16 as int)) & 1 as int)
                         * 2 - 1)))""")
    # assemble the signed 64-bit value: bit 63 contributes -2^63; a NULL
    # text column yields NULL votes -> every when() falls through -> 0,
    # matching the old left-join + coalesce(0)
    h = F.lit(0).cast("long")
    for j in range(63):
        h = h + F.when(F.element_at(F.col("_simhash_votes"), j + 1) > 0,
                       F.lit(1 << j).cast("long")) \
                 .otherwise(F.lit(0).cast("long"))
    h = h + F.when(F.element_at(F.col("_simhash_votes"), 64) > 0,
                   F.lit(-(1 << 63)).cast("long")) \
             .otherwise(F.lit(0).cast("long"))
    return (df.withColumn("_simhash_votes", votes)
            .withColumn(out, h).drop("_simhash_votes"))


def simhash_dup_pairs(df: DataFrame, col: str, id_col: str,
                      max_hamming: int = 3,
                      max_block_df: Optional[int] = 100_000) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming, using the
    pigeonhole block trick (split 64 bits into max_hamming+1 blocks; a
    near-dup pair must agree exactly on >= 1 block) — the join key is the
    block value, never a cross join.

    max_block_df caps the per-(block, value) bucket size before the pair
    join (the SimHash analog of ``max_shingle_df``): at >=10^9 docs the
    16-bit block values collide for non-dups (E[pairs] ~ n^2/2^16) and
    degenerate identical signatures (e.g. empty docs -> h=0) share every
    block, turning the join quadratic.  Buckets above the cap are dropped
    from candidate generation — exact-duplicate signatures should be folded
    first with an exact groupBy on the simhash value (or exact_dedup), which
    is O(n); this operator targets NEAR duplicates.  None disables the cap.
    """
    nblocks = max_hamming + 1
    width = 64 // nblocks
    with_h = simhash(df.select(F.col(id_col).alias("_id"), col),
                     col, "_id", "h")
    blocks = with_h.select(
        "_id", "h",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     F.shiftrightunsigned(F.col("h"), i * width)
                     .bitwiseAND(F.lit((1 << width) - 1)).alias("bval"))
            for i in range(nblocks)])).alias("bb"))
    blocks = blocks.select("_id", "h", F.col("bb.blk").alias("blk"),
                           F.col("bb.bval").alias("bval"))
    if max_block_df is not None:
        # one extra agg on the SAME key as the pair join (no new shuffle
        # shape); buckets past the cap never enter the quadratic join
        keep = (blocks.groupBy("blk", "bval")
                .agg(F.count(F.lit(1)).alias("_bdf"))
                .filter(F.col("_bdf") <= max_block_df)
                .select("blk", "bval"))
        blocks = blocks.join(keep, ["blk", "bval"])
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (a.join(b, ["blk", "bval"])
            .filter(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                    F.col("a.h").alias("ha"), F.col("b.h").alias("hb"))
            .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def dedup_components(pairs: DataFrame, id_a: str = "id_a",
                     id_b: str = "id_b", max_iter: int = 50) -> DataFrame:
    """Connected components over a near-dup pair set: (id, component) with
    component = the minimum id reachable through any chain of pairs.  This
    is the step that turns pairwise near-dup evidence (minhash_dedup_pairs /
    simhash_dup_pairs / ngram_jaccard_pairs output) into dedup GROUPS —
    a near-dup of a near-dup is the same document family even when the two
    ends never pair directly.

    Algorithm: iterative min-label propagation on the undirected pair graph
    — label(x) <- min(label(x), min over neighbours' labels) until a fixed
    point.  Converges in O(component diameter) rounds; near-dup components
    are shallow (dups of a common source), so this beats the constant
    factors of star-contraction schemes on real corpora.

    Scale shape: edges are symmetrized once and persisted; every round is
    ONE shuffle of (edge endpoint -> label) plus a min-groupBy on the node
    id — both keyed by node id, no skew beyond the graph's own degree
    distribution (bounded upstream by max_shingle_df / max_block_df /
    band-bucket caps).  Labels are localCheckpoint()ed each round so the
    plan does not grow with iterations.  Raises past ``max_iter`` instead
    of returning a partially-propagated (wrong) labelling.
    """
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .select("id", F.col("id").alias("component"))
              .localCheckpoint())
    try:
        for _ in range(max_iter):
            prop = (edges.join(labels, edges["src"] == labels["id"])
                    .select(F.col("dst").alias("id"), "component"))
            new_labels = (labels.unionByName(prop)
                          .groupBy("id")
                          .agg(F.min("component").alias("component"))
                          .localCheckpoint())
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"), "id")
                       .filter(F.col("n.component") < F.col("o.component"))
                       .limit(1).count())
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"dedup_components did not converge in {max_iter} rounds — "
            f"the pair graph has a longer chain than expected; raise "
            f"max_iter")
    finally:
        edges.unpersist()


def dedup_keep_representatives(df: DataFrame, pairs: DataFrame,
                               id_col: str,
                               id_a: str = "id_a",
                               id_b: str = "id_b") -> DataFrame:
    """Drop every near-duplicate except one representative per connected
    component (the minimum id).  Rows that appear in no pair are kept
    untouched — only listed non-representatives are anti-joined out, so
    the (huge) clean majority of the corpus never rides a shuffle wider
    than the pair graph itself."""
    comps = dedup_components(pairs, id_a, id_b)
    drop = (comps.filter(F.col("id") != F.col("component"))
            .select(F.col("id").alias(id_col)))
    return df.join(drop, id_col, "left_anti")


def embedding_neardup_pairs(df: DataFrame, vec_col: str, id_col: str,
                            threshold: float = 0.95,
                            bucketer: Optional[int] = 8) -> DataFrame:
    """Embedding near-duplicates: cosine >= threshold.

    Candidate generation via random-hyperplane LSH buckets (deterministic
    hyperplanes from splitmix64), exact cosine verify inside buckets.
    bucketer=None -> exact all-pairs (small inputs only).
    """
    from tantivy4java_spark.pipeline.similarity import (
        cosine_expr, hyperplane_bucket_udf, norm_expr)
    base = df.select(F.col(id_col).alias("_id"),
                     F.transform(vec_col, lambda x: x.cast("double")).alias("_v"))
    base = base.withColumn("_n", norm_expr(F.col("_v")))
    if bucketer:
        dim_probe = base.select(F.size("_v").alias("d")).limit(1).collect()
        dim = int(dim_probe[0]["d"]) if dim_probe else 0
        bucket = hyperplane_bucket_udf(dim, bucketer)
        base = base.withColumn("_bkt", bucket(F.col("_v")))
        join_keys = ["_bkt"]
        a, b = base.alias("a"), base.alias("b")
        cand = a.join(b, join_keys)
    else:
        a, b = base.alias("a"), base.alias("b")
        cand = a.crossJoin(b)
    cand = cand.filter(F.col("a._id") < F.col("b._id"))
    cos = cosine_expr(F.col("a._v"), F.col("b._v"),
                      F.col("a._n"), F.col("b._n"))
    return (cand.withColumn("_rawc", cos)
            .filter(F.col("_rawc") >= threshold)
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    F.round("_rawc", 6).alias("cosine")))
