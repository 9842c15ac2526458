"""Deterministic sampling / dataset-split operators for training pipelines.

A 100-TB corpus cannot use `df.sample()` for train/val/test splits: row
order is not stable across runs, partitions, or cluster sizes, so the same
document could land in train today and test tomorrow (leakage).  The
standard fix is HASH-BUCKET assignment: u = hash(salt, id) mapped to [0,1)
decides the split — stable under reshuffles, re-runs, backfills, and engine
changes, and embarrassingly parallel (no shuffle at all; the assignment is
a narrow projection).

All operators here are md5-derived and therefore exactly replayable in SQL
(the driver oracles recompute them in DuckDB).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def hash_unit(id_col: Column, salt: str = "") -> Column:
    """Deterministic u in [0, 1): first 8 hex chars of
    md5(salt || ':' || id) as a 32-bit integer / 2^32.  Pure Catalyst
    (md5 + conv + divide — whole-stage codegen, no shuffle)."""
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
            / F.lit(_DENOM))


def hash_split(df: DataFrame, id_col: str,
               fractions: Dict[str, float], salt: str = "split",
               out: str = "split") -> DataFrame:
    """Assign every row to a named split by cumulative hash-bucket ranges,
    e.g. {'train': .98, 'val': .01, 'test': .01}.  Deterministic in
    (salt, id): re-running on a grown corpus keeps every existing row's
    assignment (only new ids get new assignments) — the property a
    multi-epoch training pipeline needs."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = hash_unit(F.col(id_col), salt)
    expr = F.lit(None).cast("string")
    cum = 0.0
    bounds = []
    for name, frac in fractions.items():
        cum += frac
        bounds.append((name, cum))
    for name, hi in reversed(bounds):
        expr = F.when(u < F.lit(hi), F.lit(name)).otherwise(expr)
    return df.withColumn(out, expr)


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                salt: str = "sample") -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows with
    hash_unit < fraction.  Unlike df.sample(), stable across runs and
    partitionings; the filter is a narrow projection Catalyst can push."""
    return df.filter(hash_unit(F.col(id_col), salt) < F.lit(float(fraction)))


def stratified_hash_sample(df: DataFrame, strata_cols: Sequence[str],
                           id_col: str, fraction: float,
                           salt: str = "strata") -> DataFrame:
    """Per-stratum deterministic sample: the hash mixes the stratum value so
    each stratum is sampled independently at `fraction` (e.g. per-language
    quality-audit samples).  Still zero-shuffle — stratum membership rides
    the row."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string")
                                for c in strata_cols],
                      F.col(id_col).cast("string"))
    return df.filter(hash_unit(key, salt) < F.lit(float(fraction)))
