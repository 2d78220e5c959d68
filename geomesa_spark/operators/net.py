"""IP-network operators: CIDR longest-prefix-match join.

Web-crawl pipelines enrich every fetched page with its network identity
(ASN / hosting provider / geo registry) by joining the fetch IP against
a CIDR routing table — the canonical "longest matching prefix wins"
lookup (RFC 1812 §5.2.4.3 forwarding semantics, BGP route selection).
The reference engine family serves this class of lookup with its
attribute-indexed join machinery (geomesa-index-api attribute index +
join support, e.g. geomesa-index-api/.../index/attribute/
AttributeIndex.scala); here it is re-expressed as the Spark-native
prefix-length-stratified equi-join.

Why not a range join: a CIDR block IS an integer range
[net<<(32-plen), (net+1)<<(32-plen)), but a naive range theta-join is a
cross product. The classic trick (used by every SQL-engine GeoIP
pipeline): a routing table only contains a handful of DISTINCT prefix
lengths (≤ 33, typically ~25), so

1. collect the distinct ``plen`` values (driver-bounded by the domain:
   at most 33 longs, whatever the table size);
2. fan each probe IP out to one row per distinct length with the key
   ``ip >> (32 - plen)`` — a JVM ``explode`` over a literal array,
   bounded ×|lengths| and map-only;
3. equi-join on ``(plen, key)`` against the network side keyed by
   ``net >> (32 - plen)`` — broadcast when the table is small (global
   BGP ~1 M rows: broadcastable), plain shuffle hash join otherwise;
4. keep the longest match per probe row with ONE combining
   ``max(struct(plen, ...))`` aggregation (map-side partial agg) —
   no window, no sort.

Everything is integer shifts and comparisons in whole-stage codegen —
zero Python — and every step is exact integer arithmetic a SQL oracle
replays verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["cidr_join", "ip_to_long", "long_to_ip"]


def ip_to_long(ip: Column) -> Column:
    """Dotted-quad string -> uint32-in-a-long, pure JVM fold (no UDF):
    left-to-right ``a*256 + octet`` over the 4 split octets."""
    return F.aggregate(F.split(ip, r"\."), F.lit(0).cast("long"),
                       lambda a, o: a * 256 + o.cast("long"))


def long_to_ip(v: Column) -> Column:
    """uint32-in-a-long -> dotted-quad string (JVM, no UDF)."""
    b = [F.call_function("div", v, F.lit(1 << s)) % 256
         for s in (24, 16, 8, 0)]
    return F.concat_ws(".", *[x.cast("string") for x in b])


def cidr_join(ips: DataFrame, nets: DataFrame, ip_col: str = "ip",
              net_col: str = "net", plen_col: str = "plen",
              broadcast_nets: bool = True) -> DataFrame:
    """Longest-prefix-match join: each row of ``ips`` gains the columns
    of its most-specific covering network in ``nets`` (inner — rows with
    no covering prefix are dropped; union a default 0.0.0.0/0 row into
    ``nets`` for left semantics).

    ``ips[ip_col]`` and ``nets[net_col]`` are IPv4 addresses as longs in
    [0, 2^32); ``nets[plen_col]`` the prefix length in [0, 32]. A net
    row matches iff ``ip >> (32-plen) == net >> (32-plen)``; among
    matches the largest ``plen`` wins, ties (duplicate (net, plen) rows)
    broken deterministically by the largest remaining net-side struct.

    Output: all ``ips`` columns + all ``nets`` columns except
    ``net_col``/``plen_col``, plus ``matched_plen``. Column names across
    the two inputs must be disjoint.

    Scale shape (see module docstring): |distinct plen| ≤ 33 collected
    to the driver, probe fan-out ×|lengths| map-only, ONE equi-join
    (broadcast or shuffle) + ONE combining struct-max agg keyed by the
    probe row — the longest-prefix winner never rides a window or sort.
    """
    dup = set(ips.columns) & set(nets.columns)
    if dup:
        raise ValueError(f"column names must be disjoint, got both-sided: {sorted(dup)}")
    reserved = {"__plen__", "__key__", "__rid__", "__m__"} & (
        set(ips.columns) | set(nets.columns))
    if reserved:
        raise ValueError(
            f"inputs must not carry the reserved internal columns: {sorted(reserved)}")

    lens = sorted(r[0] for r in
                  nets.select(F.col(plen_col).cast("int")).distinct().collect())
    if any(p is None or p < 0 or p > 32 for p in lens):
        raise ValueError(f"{plen_col} must be in [0, 32], got {lens}")
    if not lens:  # empty network table: inner-join semantics -> empty
        payload = [c for c in nets.columns if c not in (net_col, plen_col)]
        out = ips.select("*", F.lit(None).cast("int").alias("matched_plen"),
                         *[F.lit(None).alias(c) for c in payload])
        return out.limit(0)

    def shift_key(col: Column, plen: Column) -> Column:
        # ip >> (32-plen) via exact long division (never a float path)
        return F.call_function("div", col.cast("long"),
                               F.call_function("shiftleft",
                                               F.lit(1).cast("long"),
                                               F.lit(32) - plen))

    nside = nets.select(
        F.col(plen_col).cast("int").alias("__plen__"),
        shift_key(F.col(net_col), F.col(plen_col).cast("int")).alias("__key__"),
        *[c for c in nets.columns if c not in (net_col, plen_col)])
    if broadcast_nets:
        nside = F.broadcast(nside)

    probes = ips.withColumn(
        "__plen__", F.explode(F.array(*[F.lit(p) for p in lens])))
    probes = probes.withColumn(
        "__key__", shift_key(F.col(ip_col), F.col("__plen__")))

    joined = probes.join(nside, on=["__plen__", "__key__"], how="inner")
    payload = [c for c in nets.columns if c not in (net_col, plen_col)]
    best = (joined.groupBy(*ips.columns)
                  .agg(F.max(F.struct(F.col("__plen__").alias("matched_plen"),
                                      *payload)).alias("__m__")))
    return best.select(*ips.columns, "__m__.matched_plen",
                       *[F.col(f"__m__.{c}").alias(c) for c in payload])
