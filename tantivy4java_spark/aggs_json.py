"""Elasticsearch-compatible aggregation JSON DSL <-> aggs dataclasses.

The reference's aggregation wire format IS this JSON: every Java class
emits it via toAggregationJson() (aggregation/TermsAggregation.java:83-110,
HistogramAggregation.java:196-240, DateHistogramAggregation.java:227-280,
RangeAggregation.java:toJson, CountAggregation.java "value_count",
AverageAggregation.java "avg", StatsAggregation.java "stats",
CardinalityAggregation.java "cardinality") and hands it to tantivy via
Quickwit's ES-compatible executor.  ``parse_aggregations`` accepts that
exact JSON (string or dict) so a reference user's aggregation requests run
unchanged; ``to_aggregation_json`` emits it back in the reference's shape.

Conventions mirrored from the reference:
- date_histogram extended_bounds / hard_bounds are epoch-millis longs
  (DateHistogramAggregation.ExtendedBounds); ISO-8601 strings are also
  accepted (ES allows both).
- range buckets may omit "key"; the ES auto-key ("from-to" with "*" for an
  open end, numbers rendered with one decimal) is generated.
- sub-aggregations nest under "aggs" (or "aggregations", the ES long form).
- multi_terms uses the ES {"terms": [{"field": ...}, ...]} source list.
  (The reference lowers multi_terms to nested terms JSON instead —
  MultiTermsAggregation.generateNestedAggregationJson — because tantivy
  lacks native multi_terms; our executor supports it directly, and the
  parser accepts both spellings.)
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Dict, Union

from tantivy4java_spark.aggs import (Agg, Avg, Cardinality, Count,
                                     DateHistogram, Histogram, Max, Min,
                                     MultiTerms, RangeAgg, Stats, Sum, Terms)

_METRIC_KEYS = {"value_count": Count, "sum": Sum, "avg": Avg, "min": Min,
                "max": Max, "stats": Stats, "cardinality": Cardinality}

# Exactly the option keys each reference emitter can write (grep of the
# toAggregationJson() bodies) plus the ES long forms we accept.  Anything
# else raises: an option we cannot honor (e.g. terms "order", metric
# "missing") must fail loudly, never silently change the result set.
# - shard_size: accepted and dropped — Spark's map-side partial aggregation
#   is the exact mechanism shard_size tunes, and it is always on.
# - keyed: accepted and dropped — it shapes the HTTP response (map vs
#   array of buckets), not the bucket keys/values; our results are
#   DataFrames, which have no such ambiguity.
_ALLOWED_KEYS = {
    "terms": {"field", "size", "shard_size"},
    "multi_terms": {"terms", "size", "shard_size"},
    "histogram": {"field", "interval", "offset", "min_doc_count",
                  "hard_bounds", "extended_bounds", "keyed"},
    "date_histogram": {"field", "fixed_interval", "calendar_interval",
                       "offset", "time_zone", "format", "min_doc_count",
                       "hard_bounds", "extended_bounds", "keyed"},
    "range": {"field", "ranges", "keyed"},
}
_ALLOWED_KEYS.update({k: {"field"} for k in _METRIC_KEYS})


def _check_keys(kind: str, body: dict) -> None:
    extra = set(body) - _ALLOWED_KEYS[kind]
    if extra:
        raise ValueError(
            f"{kind} aggregation: unsupported option(s) {sorted(extra)} "
            f"(supported: {sorted(_ALLOWED_KEYS[kind])})")


def _bounds(body: dict, name: str):
    b = body.get(name)
    if b is None:
        return None
    return (b["min"], b["max"])


def _date_bound(v):
    """Epoch-millis long (the reference's ExtendedBounds/HardBounds) or an
    ISO-8601 string (passed through — aggs._ts_lit parses it)."""
    if isinstance(v, bool):
        raise ValueError(f"not a date bound: {v!r}")
    if isinstance(v, (int, float)):
        return _dt.datetime.fromtimestamp(v / 1000.0, _dt.timezone.utc)
    return v


def _sub_aggs(node: dict) -> Dict[str, Agg]:
    sub = node.get("aggs", node.get("aggregations"))
    return parse_aggregations(sub) if sub else {}


def _parse_one(node: dict) -> Agg:
    kinds = [k for k in node if k not in ("aggs", "aggregations")]
    if len(kinds) != 1:
        raise ValueError(
            f"aggregation node must have exactly one type key, got {kinds}")
    kind, body = kinds[0], node[kinds[0]]
    if kind not in _ALLOWED_KEYS:
        raise ValueError(f"unknown aggregation type {kind!r}")
    if not isinstance(body, dict):
        raise ValueError(f"{kind} aggregation body must be an object")
    _check_keys(kind, body)
    sub = _sub_aggs(node)
    if kind in _METRIC_KEYS:
        if sub:
            raise ValueError(f"{kind} is a metric; it takes no sub-aggs")
        return _METRIC_KEYS[kind](field=body["field"])
    if kind == "terms":
        return Terms(field=body["field"], size=int(body.get("size", 10)),
                     sub=sub)  # shard_size = Spark map-side partials (free)
    if kind == "multi_terms":
        fields = [t["field"] for t in body["terms"]]
        return MultiTerms(fields=fields, size=int(body.get("size", 10)),
                          sub=sub)
    if kind == "histogram":
        kw = dict(field=body["field"], interval=float(body["interval"]),
                  sub=sub)
        if "offset" in body:
            kw["offset"] = float(body["offset"])
        if "min_doc_count" in body:
            kw["min_doc_count"] = int(body["min_doc_count"])
        for b in ("hard_bounds", "extended_bounds"):
            v = _bounds(body, b)
            if v is not None:
                kw[b] = (float(v[0]), float(v[1]))
        return Histogram(**kw)
    if kind == "date_histogram":
        kw = dict(field=body["field"], sub=sub)
        kw["fixed_interval"] = body.get("fixed_interval")
        if "calendar_interval" in body:
            kw["calendar_interval"] = body["calendar_interval"]
        if "offset" in body:
            kw["offset"] = body["offset"]
        if "time_zone" in body:
            kw["time_zone"] = body["time_zone"]
        if "format" in body:
            kw["format"] = body["format"]
        if "min_doc_count" in body:
            kw["min_doc_count"] = int(body["min_doc_count"])
        for b in ("hard_bounds", "extended_bounds"):
            v = _bounds(body, b)
            if v is not None:
                kw[b] = (_date_bound(v[0]), _date_bound(v[1]))
        if kw["fixed_interval"] is None and "calendar_interval" not in body:
            raise ValueError("date_histogram needs fixed_interval or "
                             "calendar_interval")
        return DateHistogram(**kw)
    if kind == "range":
        ranges = []
        for r in body["ranges"]:
            extra = set(r) - {"key", "from", "to"}
            if extra:
                raise ValueError(
                    f"range bucket: unsupported option(s) {sorted(extra)}")
            lo = float(r["from"]) if "from" in r and r["from"] is not None \
                else None
            hi = float(r["to"]) if "to" in r and r["to"] is not None else None
            key = r.get("key")
            if key is None:  # ES auto-key: "from-to", "*" for an open end
                key = (f"{lo:.1f}" if lo is not None else "*") + "-" + \
                    (f"{hi:.1f}" if hi is not None else "*")
            ranges.append((key, lo, hi))
        return RangeAgg(field=body["field"], ranges=ranges, sub=sub)
    raise ValueError(f"unknown aggregation type {kind!r}")


def parse_aggregations(spec: Union[str, dict]) -> Dict[str, Agg]:
    """{"name": {<type>: {...}, "aggs": {...}}, ...} -> {name: Agg}.

    Accepts the exact JSON the reference's toAggregationJson() emits, as a
    string or an already-parsed dict."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    if not isinstance(spec, dict):
        raise ValueError("aggregation spec must be a JSON object")
    return {name: _parse_one(node) for name, node in spec.items()}


def _emit_sub(d: dict, sub: Dict[str, Agg]) -> dict:
    if sub:
        d["aggs"] = {n: to_aggregation_json(a) for n, a in sub.items()}
    return d


def _num(v: float):
    """ints stay ints in the emitted JSON (the reference emits bare longs)."""
    f = float(v)
    return int(f) if f.is_integer() else f


def to_aggregation_json(agg: Agg) -> dict:
    """The reference's toAggregationJson() shape for one aggregation
    (as a dict; json.dumps it for the wire form)."""
    if isinstance(agg, Count):
        return {"value_count": {"field": agg.field}}
    if isinstance(agg, Sum):
        return {"sum": {"field": agg.field}}
    if isinstance(agg, Avg):
        return {"avg": {"field": agg.field}}
    if isinstance(agg, Min):
        return {"min": {"field": agg.field}}
    if isinstance(agg, Max):
        return {"max": {"field": agg.field}}
    if isinstance(agg, Stats):
        return {"stats": {"field": agg.field}}
    if isinstance(agg, Cardinality):
        return {"cardinality": {"field": agg.field}}
    if isinstance(agg, Terms):
        return _emit_sub(
            {"terms": {"field": agg.field, "size": agg.size}}, agg.sub)
    if isinstance(agg, MultiTerms):
        return _emit_sub(
            {"multi_terms": {"terms": [{"field": f} for f in agg.fields],
                             "size": agg.size}}, agg.sub)
    if isinstance(agg, Histogram):
        body = {"field": agg.field, "interval": _num(agg.interval)}
        if agg.offset:
            body["offset"] = _num(agg.offset)
        if agg.min_doc_count:
            body["min_doc_count"] = agg.min_doc_count
        for name, v in (("hard_bounds", agg.hard_bounds),
                        ("extended_bounds", agg.extended_bounds)):
            if v is not None:
                body[name] = {"min": _num(v[0]), "max": _num(v[1])}
        return _emit_sub({"histogram": body}, agg.sub)
    if isinstance(agg, DateHistogram):
        body = {"field": agg.field}
        if agg.calendar_interval is not None:
            body["calendar_interval"] = agg.calendar_interval
        else:
            body["fixed_interval"] = agg.fixed_interval
        if agg.offset != "0s":
            body["offset"] = agg.offset
        if agg.time_zone != "UTC":
            body["time_zone"] = agg.time_zone
        if agg.min_doc_count != 1:
            body["min_doc_count"] = agg.min_doc_count
        if agg.format is not None:
            body["format"] = agg.format
        for name, v in (("hard_bounds", agg.hard_bounds),
                        ("extended_bounds", agg.extended_bounds)):
            if v is not None:
                body[name] = {"min": _date_millis(v[0]),
                              "max": _date_millis(v[1])}
        return _emit_sub({"date_histogram": body}, agg.sub)
    if isinstance(agg, RangeAgg):
        ranges = []
        for key, lo, hi in agg.ranges:
            r: dict = {"key": key}
            if lo is not None:
                r["from"] = _num(lo)
            if hi is not None:
                r["to"] = _num(hi)
            ranges.append(r)
        return _emit_sub({"range": {"field": agg.field, "ranges": ranges}},
                         agg.sub)
    raise TypeError(f"unknown aggregation {type(agg).__name__}")


def _date_millis(v):
    """Emit a date bound the way the reference does: epoch millis."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return int(v)
    if isinstance(v, str):
        from tantivy4java_spark.parser import parse_iso_datetime
        dt = parse_iso_datetime(v)
        if dt is None:
            raise ValueError(f"not an ISO datetime bound: {v!r}")
        v = dt
    if v.tzinfo is None:
        v = v.replace(tzinfo=_dt.timezone.utc)
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    return (v - epoch) // _dt.timedelta(milliseconds=1)
