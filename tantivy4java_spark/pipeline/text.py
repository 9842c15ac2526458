"""Text analysis operators for training-data pipelines.

Every function is a pure Catalyst expression pipeline (JVM, codegen) with an
equivalent ANSI-SQL form for the DuckDB oracle; nothing row-at-a-time.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deliberately tiny, deterministic stopword table (shared with the oracle SQL)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

# language marker tokens for the n-gram/keyword heuristic language ID
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "es": ["el", "la", "que"],
    "de": ["der", "die", "und"],
    "zh": ["de", "shi", "le"],
}


def tokens_col(col: Column) -> Column:
    """Whitespace tokens, empties removed (matches DuckDB string_split)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def token_count(df: DataFrame, col: str, out: str = "n_tokens") -> DataFrame:
    """Whitespace token count (fast path for budget/packing decisions)."""
    return df.withColumn(out, F.size(tokens_col(F.col(col))).cast("long"))


def bpe_ish_token_count(df: DataFrame, col: str, out: str = "n_bpe") -> DataFrame:
    """BPE-approximating count: word-pieces of <=4 chars + digits/punct runs.

    regexp count of the pieces a byte-pair encoder would roughly produce;
    deterministic and expressible in both Spark and DuckDB:
      pieces = ceil(len(word)/4) summed over words + punctuation runs.
    """
    toks = tokens_col(F.col(col))
    word_pieces = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"))
    return df.withColumn(out, word_pieces)


def quality_score(df: DataFrame, col: str, out: str = "quality") -> DataFrame:
    """Composite [0,1] quality heuristic: length band, alpha ratio,
    stopword presence, repetition penalty.  All closed-form."""
    c = F.col(col)
    toks = tokens_col(c)
    n = F.size(toks).cast("double")
    n_chars = F.length(c).cast("double")
    alpha = (F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
             / F.greatest(n_chars, F.lit(1.0)))
    stop_hits = F.size(F.array_intersect(
        toks, F.array(*[F.lit(s) for s in STOPWORDS]))).cast("double")
    stop_ratio = stop_hits / F.lit(float(len(STOPWORDS)))
    distinct_ratio = (F.size(F.array_distinct(toks)).cast("double")
                      / F.greatest(n, F.lit(1.0)))
    len_band = F.when((n >= 10) & (n <= 5000), F.lit(1.0)) \
        .when(n < 10, n / F.lit(10.0)).otherwise(F.lit(5000.0) / n)
    score = (F.lit(0.4) * len_band + F.lit(0.2) * alpha
             + F.lit(0.2) * stop_ratio + F.lit(0.2) * distinct_ratio)
    return df.withColumn(out, F.round(score, 6))


def lang_id(df: DataFrame, col: str, out: str = "lang_pred") -> DataFrame:
    """Marker-token language heuristic: argmax over per-language marker hits;
    deterministic tie-break by language code."""
    toks = tokens_col(F.lower(F.col(col)))
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append(F.struct(
            F.size(F.array_intersect(toks, markers)).alias("hits"),
            F.lit(lang).alias("lang")))
    # max by (hits, then reverse-alpha) => pick highest hits, ties -> first alpha
    best = F.array_max(F.array(*[
        F.struct(s["hits"].alias("hits"),
                 F.lit(99 - i).alias("prio"),
                 s["lang"].alias("lang"))
        for i, s in enumerate(scores)]))
    return df.withColumn(out, best["lang"])


def fingerprint(df: DataFrame, col: str, out: str = "fp") -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    whitespace tokens (token -> length+first-char code), closed form,
    identical in DuckDB SQL.  M = 2^31-1 keeps acc*P inside int64 (ANSI-safe
    in Spark, exact in any engine)."""
    toks = tokens_col(F.col(col))
    P = 1_000_003
    M = (1 << 31) - 1
    code = lambda t: (F.length(t).cast("long") * F.lit(131)
                      + F.ascii(F.substring(t, 1, 1)).cast("long"))
    fp = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(P) + code(t)) % F.lit(M))
    return df.withColumn(out, fp)


def ngrams_col(col: Column, k: int) -> Column:
    """NON-distinct k-word grams in order (repetition measurement needs the
    multiset, unlike dedup.shingles_col which dedups)."""
    toks = tokens_col(col)
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))


def repetition_signals(df: DataFrame, col: str) -> DataFrame:
    """Gopher/C4-inspired repetition + shape signals, all closed-form
    Catalyst (and replayable in ANSI SQL for the oracle):

      dup_line_frac     1 - distinct/total non-empty lines
      dup_2gram_frac    1 - distinct/total word 2-grams (multiset)
      mean_word_len     mean characters per whitespace token
      symbol_word_ratio (# chars + '...' runs) per token
      bullet_line_frac  lines starting with -, * or •
      ellipsis_line_frac lines ending with ...

    These are the filters a training-data pipeline runs BEFORE tokenizing
    100 TB: every signal is one narrow projection — no shuffle, no UDF.
    (Rule family: Gopher's repetition-and-shape heuristics; we document
    thresholds in gopher_quality_filter below rather than claiming the
    paper's exact char-fraction definitions.)"""
    c = F.col(col)
    toks = tokens_col(c)
    n_tok = F.size(toks).cast("double")
    lines = F.filter(F.split(c, r"\n"),
                     lambda l: F.trim(l) != F.lit(""))
    n_lines = F.size(lines).cast("double")
    g2 = ngrams_col(c, 2)
    n_g2 = F.size(g2).cast("double")

    def frac(expr):
        return F.round(expr, 6)

    dup_line = F.when(n_lines > 0, F.lit(1.0) -
                      F.size(F.array_distinct(lines)) / n_lines) \
        .otherwise(F.lit(0.0))
    dup_g2 = F.when(n_g2 > 0, F.lit(1.0) -
                    F.size(F.array_distinct(g2)) / n_g2) \
        .otherwise(F.lit(0.0))
    total_word_chars = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t).cast("long")).cast("double")
    mean_wl = F.when(n_tok > 0, total_word_chars / n_tok).otherwise(F.lit(0.0))
    hashes = (F.length(c) - F.length(F.replace(c, F.lit("#")))).cast("double")
    ellipses = ((F.length(c) - F.length(F.replace(c, F.lit("..."))))
                / F.lit(3.0))
    sym_ratio = (hashes + ellipses) / F.greatest(n_tok, F.lit(1.0))
    bullet = (F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
              .cast("double") / F.greatest(n_lines, F.lit(1.0)))
    ell_line = (F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))
                .cast("double") / F.greatest(n_lines, F.lit(1.0)))
    return (df.withColumn("dup_line_frac", frac(dup_line))
            .withColumn("dup_2gram_frac", frac(dup_g2))
            .withColumn("mean_word_len", frac(mean_wl))
            .withColumn("symbol_word_ratio", frac(sym_ratio))
            .withColumn("bullet_line_frac", frac(bullet))
            .withColumn("ellipsis_line_frac", frac(ell_line)))


# Gopher-inspired keep thresholds over repetition_signals (documented,
# deterministic; tune per corpus)
GOPHER_THRESHOLDS = {
    "dup_line_frac_max": 0.30,
    "dup_2gram_frac_max": 0.60,
    "mean_word_len_min": 2.0,
    "mean_word_len_max": 12.0,
    "symbol_word_ratio_max": 0.10,
    "bullet_line_frac_max": 0.90,
    "ellipsis_line_frac_max": 0.30,
}


def gopher_quality_filter(df: DataFrame, col: str,
                          out: str = "keep") -> DataFrame:
    """Boolean keep verdict from repetition_signals at GOPHER_THRESHOLDS."""
    t = GOPHER_THRESHOLDS
    s = repetition_signals(df, col)
    keep = ((F.col("dup_line_frac") <= t["dup_line_frac_max"])
            & (F.col("dup_2gram_frac") <= t["dup_2gram_frac_max"])
            & (F.col("mean_word_len") >= t["mean_word_len_min"])
            & (F.col("mean_word_len") <= t["mean_word_len_max"])
            & (F.col("symbol_word_ratio") <= t["symbol_word_ratio_max"])
            & (F.col("bullet_line_frac") <= t["bullet_line_frac_max"])
            & (F.col("ellipsis_line_frac") <= t["ellipsis_line_frac_max"]))
    return s.withColumn(out, keep)


def sql_token_count(col: str) -> str:
    return f"cast(len(list_filter(string_split_regex({col}, '\\s+'), x -> x <> '')) as bigint)"


def sql_bpe_count(col: str) -> str:
    return ("cast(list_sum(list_transform(list_filter(string_split_regex("
            f"{col}, '\\s+'), x -> x <> ''), t -> cast(ceil(length(t)/4.0) as bigint))) as bigint)")


def sql_quality(col: str) -> str:
    stop_arr = "[" + ",".join(f"'{s}'" for s in STOPWORDS) + "]"
    toks = f"list_filter(string_split_regex({col}, '\\s+'), x -> x <> '')"
    return f"""
    round(
      0.4 * (case when len({toks}) between 10 and 5000 then 1.0
                  when len({toks}) < 10 then len({toks})/10.0
                  else 5000.0/len({toks}) end)
      + 0.2 * (length(regexp_replace({col}, '[^A-Za-z]', '', 'g'))
               / greatest(cast(length({col}) as double), 1.0))
      + 0.2 * (cast(len(list_intersect({toks}, {stop_arr})) as double) / {len(STOPWORDS)}.0)
      + 0.2 * (cast(len(list_distinct({toks})) as double)
               / greatest(cast(len({toks}) as double), 1.0))
    , 6)"""


def sql_repetition_signals(col: str) -> str:
    """Comma-joined SQL select-list replaying repetition_signals exactly
    (same rounding, same guards) — DuckDB dialect."""
    toks = f"list_filter(string_split_regex({col}, '\\s+'), x -> x <> '')"
    lines = f"list_filter(string_split_regex({col}, '\\n'), l -> trim(l) <> '')"
    g2 = (f"list_transform(range(1, greatest(len({toks}), 1)), "
          f"i -> concat_ws(' ', {toks}[i], {toks}[i+1]))")
    n_tok = f"cast(len({toks}) as double)"
    n_lines = f"cast(len({lines}) as double)"
    n_g2 = f"cast(len({g2}) as double)"
    dup_line = (f"case when {n_lines} > 0 then 1.0 - "
                f"len(list_distinct({lines})) / {n_lines} else 0.0 end")
    dup_g2 = (f"case when {n_g2} > 0 then 1.0 - "
              f"len(list_distinct({g2})) / {n_g2} else 0.0 end")
    mean_wl = (f"case when {n_tok} > 0 then "
               f"cast(list_sum(list_transform({toks}, t -> length(t))) "
               f"as double) / {n_tok} else 0.0 end")
    sym = (f"((length({col}) - length(replace({col}, '#', ''))) + "
           f"(length({col}) - length(replace({col}, '...', ''))) / 3.0) "
           f"/ greatest({n_tok}, 1.0)")
    bullet = (f"cast(len(list_filter({lines}, "
              f"l -> regexp_matches(l, '^\\s*[-*•]'))) as double) "
              f"/ greatest({n_lines}, 1.0)")
    ell = (f"cast(len(list_filter({lines}, "
           f"l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) as double) "
           f"/ greatest({n_lines}, 1.0)")
    return (f"round({dup_line}, 6) AS dup_line_frac, "
            f"round({dup_g2}, 6) AS dup_2gram_frac, "
            f"round({mean_wl}, 6) AS mean_word_len, "
            f"round({sym}, 6) AS symbol_word_ratio, "
            f"round({bullet}, 6) AS bullet_line_frac, "
            f"round({ell}, 6) AS ellipsis_line_frac")


def sql_fingerprint(col: str) -> str:
    toks = f"list_filter(string_split_regex({col}, '\\s+'), x -> x <> '')"
    P, M = 1_000_003, (1 << 31) - 1
    return (f"list_reduce(list_prepend(cast(0 as bigint), "
            f"list_transform({toks}, t -> cast(length(t)*131 + ascii(substr(t,1,1)) as bigint))), "
            f"(acc, c) -> (acc * {P} + c) % {M})")
