"""Aggregations — the Elasticsearch-compatible DSL (SURVEY.md §2.3 A1-A10).

Reference entry point: SplitSearcher.aggregate(query, aggs)
(split/SplitSearcher.java:304-357); each Java class emits ES JSON executed by
tantivy.  Here every aggregation is a thin declarative layer over ONE
`groupBy().agg()` pass on the matched-docs DataFrame — partial (map-side)
aggregation, AQE and whole-stage codegen come free from Catalyst.

Bucket aggs (terms / multi_terms / histogram / date_histogram / range) accept
nested sub-aggregations (README.md:1126-1146) — they fold into the same
single groupBy pass, never a second shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Agg:
    """Base; metric aggs expose exprs(), bucket aggs expose group + exprs."""


@dataclass
class Count(Agg):  # aggregation/CountAggregation.java
    field: str

    def exprs(self, prefix: str) -> List[Column]:
        return [F.count(F.col(self.field)).alias(prefix)]


@dataclass
class Sum(Agg):  # SumAggregation.java
    field: str

    def exprs(self, prefix: str) -> List[Column]:
        return [F.sum(F.col(self.field)).alias(prefix)]


@dataclass
class Avg(Agg):  # AverageAggregation.java
    field: str

    def exprs(self, prefix: str) -> List[Column]:
        return [F.avg(F.col(self.field)).alias(prefix)]


@dataclass
class Min(Agg):
    field: str

    def exprs(self, prefix: str) -> List[Column]:
        return [F.min(F.col(self.field)).alias(prefix)]


@dataclass
class Max(Agg):
    field: str

    def exprs(self, prefix: str) -> List[Column]:
        return [F.max(F.col(self.field)).alias(prefix)]


@dataclass
class Stats(Agg):  # StatsAggregation.java:60-66 -> {count,sum,avg,min,max}
    field: str

    def exprs(self, prefix: str) -> List[Column]:
        c = F.col(self.field)
        return [
            F.count(c).alias(f"{prefix}_count"),
            F.sum(c).alias(f"{prefix}_sum"),
            F.avg(c).alias(f"{prefix}_avg"),
            F.min(c).alias(f"{prefix}_min"),
            F.max(c).alias(f"{prefix}_max"),
        ]


@dataclass
class Cardinality(Agg):
    """CardinalityAggregation.java:27-60 — approx distinct.  exact=True swaps
    in count_distinct when a deterministic answer is required (oracles)."""
    field: str
    exact: bool = False

    def exprs(self, prefix: str) -> List[Column]:
        c = F.col(self.field)
        e = F.count_distinct(c) if self.exact else F.approx_count_distinct(c)
        return [e.alias(prefix)]


_METRICS = (Count, Sum, Avg, Min, Max, Stats, Cardinality)


@dataclass
class Terms(Agg):
    """TermsAggregation.java:26-110 — top-`size` buckets by doc count.
    shard_size is Spark's map-side partial agg (free)."""
    field: str
    size: int = 10
    sub: Dict[str, Agg] = dc_field(default_factory=dict)

    def group_cols(self) -> List[Column]:
        return [F.col(self.field)]


@dataclass
class MultiTerms(Agg):  # MultiTermsAggregation.java:52-74
    fields: Sequence[str]
    size: int = 10
    sub: Dict[str, Agg] = dc_field(default_factory=dict)

    def group_cols(self) -> List[Column]:
        return [F.col(f) for f in self.fields]


@dataclass
class Histogram(Agg):
    """HistogramAggregation.java — bucket key = floor((v-offset)/interval)*interval+offset."""
    field: str
    interval: float
    offset: float = 0.0
    min_doc_count: int = 0
    sub: Dict[str, Agg] = dc_field(default_factory=dict)

    def key_col(self) -> Column:
        v = F.col(self.field).cast("double")
        return (F.floor((v - F.lit(self.offset)) / F.lit(self.interval))
                * F.lit(self.interval) + F.lit(self.offset))


@dataclass
class DateHistogram(Agg):
    """DateHistogramAggregation.java:92-165 — fixed_interval buckets.
    interval: '1d', '1h', '30m', '10s' (fixed intervals only, like tantivy)."""
    field: str
    fixed_interval: str = "1d"
    sub: Dict[str, Agg] = dc_field(default_factory=dict)

    _UNITS = {"d": 86400, "h": 3600, "m": 60, "s": 1}

    def seconds(self) -> int:
        import re
        m = re.fullmatch(r"(\d+)([dhms])", self.fixed_interval)
        if not m:
            raise ValueError(f"bad fixed_interval {self.fixed_interval}")
        return int(m.group(1)) * self._UNITS[m.group(2)]

    def key_col(self) -> Column:
        secs = self.seconds()
        epoch = F.unix_timestamp(F.col(self.field))
        return F.to_timestamp(F.from_unixtime(
            F.floor(epoch / F.lit(secs)) * F.lit(secs)))


@dataclass
class RangeAgg(Agg):
    """RangeAggregation.java:69-142 — [from, to) buckets (ES semantics)."""
    field: str
    ranges: Sequence[Tuple[str, Optional[float], Optional[float]]]  # (key, from, to)
    sub: Dict[str, Agg] = dc_field(default_factory=dict)

    def key_col(self) -> Column:
        v = F.col(self.field).cast("double")
        expr = F.lit(None).cast("string")
        for key, lo, hi in reversed(list(self.ranges)):
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (v >= F.lit(lo))
            if hi is not None:
                cond = cond & (v < F.lit(hi))
            expr = F.when(cond, F.lit(key)).otherwise(expr)
        return expr


def _sub_exprs(sub: Dict[str, Agg]) -> List[Column]:
    out: List[Column] = [F.count(F.lit(1)).alias("doc_count")]
    for name, agg in sub.items():
        if not isinstance(agg, _METRICS):
            raise TypeError("sub-aggregations must be metric aggs")
        out.extend(agg.exprs(name))
    return out


def apply_agg(df: DataFrame, agg: Agg, name: str = "value") -> DataFrame:
    """Run one aggregation over an (already query-matched) DataFrame.

    Metric -> single row; bucket -> one row per bucket, ordered like the
    reference (terms: doc_count desc; histogram/date_histogram: key asc)."""
    if isinstance(agg, _METRICS):
        return df.agg(*agg.exprs(name))
    if isinstance(agg, (Terms, MultiTerms)):
        grouped = df.groupBy(*agg.group_cols()).agg(*_sub_exprs(agg.sub))
        keys = [agg.field] if isinstance(agg, Terms) else list(agg.fields)
        # deterministic bucket cut: count desc, then every key asc
        return (grouped.orderBy(F.desc("doc_count"),
                                *[F.asc(k) for k in keys])
                .limit(agg.size))
    if isinstance(agg, Histogram):
        key = agg.key_col().alias("key")
        out = df.groupBy(key).agg(*_sub_exprs(agg.sub)).orderBy("key")
        if agg.min_doc_count > 0:
            out = out.filter(F.col("doc_count") >= agg.min_doc_count)
        return out
    if isinstance(agg, DateHistogram):
        key = agg.key_col().alias("key")
        return df.groupBy(key).agg(*_sub_exprs(agg.sub)).orderBy("key")
    if isinstance(agg, RangeAgg):
        key = agg.key_col().alias("key")
        return (df.filter(key.isNotNull())
                .groupBy(key).agg(*_sub_exprs(agg.sub)).orderBy("key"))
    raise TypeError(f"unknown aggregation {type(agg).__name__}")


def aggregate(searcher, query, aggs: Dict[str, Agg],
              source: Optional[DataFrame] = None) -> Dict[str, DataFrame]:
    """SplitSearcher.aggregate analog: run the query, aggregate over matches.

    Docs-table fast-field columns are used directly; pass ``source`` to
    aggregate over arbitrary source columns (joined on doc_id).
    """
    matched = searcher.score_query(query).select("doc_id")
    base = searcher.docs().join(matched, "doc_id")
    if source is not None:
        base = base.join(source, "doc_id")
    return {name: apply_agg(base, agg, name) for name, agg in aggs.items()}
