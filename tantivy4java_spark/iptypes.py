"""IP_ADDR field support (SURVEY.md §1.2) + CIDR/range rewrites (§4 O5).

Reference behavior: ALL addresses stored as IPv6 — IPv4 is mapped into the
v6 space (core/SchemaBuilder.java:375-388, native/src/searcher/mod.rs:489-495);
the parser rewrites `ip:a.b.c.d/p` and `ip:a.b.*` into inclusive ranges
before query construction (native/src/split_query/parse_query.rs:59-104,
ip_rewriter.rs); a non-contiguous wildcard is an explicit error (:88-97).

Spark-first: an IP field is indexed as a raw keyword term (exact match) AND
materialized as a fast column `_ipnum_<field>` holding the CANONICAL 32-digit
lowercase hex of the 128-bit value.  Lexicographic order on that fixed-width
string equals numeric order on the u128, so full-IPv6 CIDR/range predicates
are plain Catalyst string-range filters (no u128 arithmetic needed).  IPv4
dotted quads take a pure-Catalyst encode path; literal IPv6 strings go
through a vectorized UDF (stdlib ipaddress) — rare in IPv4-majority data.
"""

from __future__ import annotations

import ipaddress
import re
from typing import Optional, Tuple

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tantivy4java_spark import queries as Q

_CIDR_RE = re.compile(r"^(\d{1,3}(?:\.\d{1,3}){3})/(\d{1,2})$")
_WILD_RE = re.compile(r"^(\d{1,3}(?:\.(?:\d{1,3}|\*)){3})$")

_V4_OFFSET = 0xFFFF00000000  # IPv4-mapped-IPv6 prefix ::ffff:0:0


def ip_to_int(ip: str) -> int:
    """Any IP literal -> u128 int in the unified IPv6 space (IPv4 and
    IPv4-mapped addresses land on the ::ffff:a.b.c.d value)."""
    addr = ipaddress.ip_address(ip)
    if isinstance(addr, ipaddress.IPv4Address):
        return _V4_OFFSET + int(addr)
    v4 = addr.ipv4_mapped
    if v4 is not None:
        return _V4_OFFSET + int(v4)
    return int(addr)


def ip_to_hex(ip: str) -> str:
    """Canonical 32-digit lowercase hex (the `_ipnum_` encoding)."""
    return format(ip_to_int(ip), "032x")


def _hex32(n: int) -> str:
    return format(n, "032x")


def _ipv6_hex_udf():
    @F.pandas_udf(T.StringType())
    def _conv(ips: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            try:
                return ip_to_hex(s)
            except ValueError:
                return None
        return ips.map(one)
    return _conv


def ip_num_col(col: Column) -> Column:
    """IP string column -> canonical hex32 column.

    IPv4 dotted quads (the common case) encode in pure Catalyst: octet math
    + the v4-mapped offset + lpad(hex).  Rows containing ':' (IPv6 literals,
    including v4-mapped forms) route through the stdlib-ipaddress UDF."""
    parts = F.split(col, r"\.")
    v4num = (F.element_at(parts, 1).cast("long") * F.lit(16777216)
             + F.element_at(parts, 2).cast("long") * F.lit(65536)
             + F.element_at(parts, 3).cast("long") * F.lit(256)
             + F.element_at(parts, 4).cast("long"))
    v4hex = F.lpad(F.lower(F.hex(v4num + F.lit(_V4_OFFSET))), 32, "0")
    return F.when(col.contains(":"), _ipv6_hex_udf()(col)).otherwise(v4hex)


def cidr_to_range(cidr: str) -> Tuple[str, str]:
    """'10.0.0.0/8' or '2001:db8::/32' -> inclusive (lo, hi) hex32."""
    net = ipaddress.ip_network(cidr, strict=False)
    lo, hi = int(net.network_address), int(net.broadcast_address)
    if isinstance(net, ipaddress.IPv4Network):
        lo, hi = lo + _V4_OFFSET, hi + _V4_OFFSET
    return _hex32(lo), _hex32(hi)


def wildcard_to_range(pattern: str) -> Tuple[str, str]:
    """'192.168.*.*' -> inclusive hex32 range; non-contiguous wildcards (a
    star followed by a concrete octet) raise, matching parse_query.rs:88-97."""
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
    return _hex32(toint(lo) + _V4_OFFSET), _hex32(toint(hi) + _V4_OFFSET)


def rewrite_ip_query(field: str, value: str) -> Optional[Q.Query]:
    """CIDR / wildcard / exact IP (v4 or v6) -> Range over the hex32 fast
    column `_ipnum_<field>` (the O5 rewrite).  Returns None if `value`
    doesn't look like an IP expression."""
    num_field = f"_ipnum_{field}"
    if _CIDR_RE.match(value) or (":" in value and "/" in value):
        try:
            lo, hi = cidr_to_range(value)
        except ValueError:
            return None
        return Q.Range(num_field, lo, hi, True, True)
    if "*" in value and _WILD_RE.match(value):
        lo, hi = wildcard_to_range(value)
        return Q.Range(num_field, lo, hi, True, True)
    try:
        h = ip_to_hex(value)
    except ValueError:
        return None
    return Q.Range(num_field, h, h, True, True)
