"""IP_ADDR field support (SURVEY.md §1.2) + CIDR/range rewrites (§4 O5).

Reference behavior: IPv4 stored as IPv6-mapped (core/SchemaBuilder.java:375-
388, native/src/searcher/mod.rs:489-495); the parser rewrites `ip:a.b.c.d/p`
and `ip:a.b.*` into inclusive ranges before query construction
(native/src/split_query/parse_query.rs:59-104, ip_rewriter.rs); a
non-contiguous wildcard is an explicit error (:88-97).

Spark-first: an IP field is indexed as a raw keyword term (exact match) AND
materialized as a numeric fast column `_ipnum_<field>` (u128-as-2xlong would
be needed for full IPv6; v1 keeps IPv4 + IPv4-mapped-IPv6 in one i64) so
CIDR/range predicates become plain Catalyst range filters.
"""

from __future__ import annotations

import ipaddress
import re
from typing import Optional, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from tantivy4java_spark import queries as Q

_CIDR_RE = re.compile(r"^(\d{1,3}(?:\.\d{1,3}){3})/(\d{1,2})$")
_WILD_RE = re.compile(r"^(\d{1,3}(?:\.(?:\d{1,3}|\*)){3})$")


def ip_to_int(ip: str) -> int:
    """IPv4 or IPv4-mapped IPv6 -> int (reference maps v4 into v6 space)."""
    addr = ipaddress.ip_address(ip)
    if isinstance(addr, ipaddress.IPv6Address):
        v4 = addr.ipv4_mapped
        if v4 is None:
            raise ValueError(f"full IPv6 not supported in v1: {ip}")
        addr = v4
    return int(addr)


def ip_num_col(col: Column) -> Column:
    """IPv4 dotted-quad string column -> numeric column (pure Catalyst)."""
    parts = F.split(col, r"\.")
    return (F.element_at(parts, 1).cast("long") * F.lit(16777216)
            + F.element_at(parts, 2).cast("long") * F.lit(65536)
            + F.element_at(parts, 3).cast("long") * F.lit(256)
            + F.element_at(parts, 4).cast("long"))


def cidr_to_range(cidr: str) -> Tuple[int, int]:
    """'10.0.0.0/8' -> inclusive (lo, hi) ints."""
    net = ipaddress.ip_network(cidr, strict=False)
    return int(net.network_address), int(net.broadcast_address)


def wildcard_to_range(pattern: str) -> Tuple[int, int]:
    """'192.168.*.*' -> inclusive range; non-contiguous wildcards (a star
    followed by a concrete octet) raise, matching parse_query.rs:88-97."""
    octets = pattern.split(".")
    if len(octets) != 4:
        raise ValueError(f"bad IP wildcard: {pattern}")
    seen_star = False
    lo, hi = [], []
    for o in octets:
        if o == "*":
            seen_star = True
            lo.append(0)
            hi.append(255)
        else:
            if seen_star:
                raise ValueError(
                    f"non-contiguous IP wildcard not supported: {pattern}")
            v = int(o)
            lo.append(v)
            hi.append(v)
    toint = lambda xs: xs[0] * 16777216 + xs[1] * 65536 + xs[2] * 256 + xs[3]
    return toint(lo), toint(hi)


def rewrite_ip_query(field: str, value: str) -> Optional[Q.Query]:
    """CIDR / wildcard / exact IP -> Range or Term over the numeric fast
    column `_ipnum_<field>` (the O5 rewrite).  Returns None if `value`
    doesn't look like an IP expression."""
    num_field = f"_ipnum_{field}"
    m = _CIDR_RE.match(value)
    if m:
        lo, hi = cidr_to_range(value)
        return Q.Range(num_field, lo, hi, True, True)
    if "*" in value and _WILD_RE.match(value):
        lo, hi = wildcard_to_range(value)
        return Q.Range(num_field, lo, hi, True, True)
    try:
        n = ip_to_int(value)
    except ValueError:
        return None
    return Q.Range(num_field, n, n, True, True)
