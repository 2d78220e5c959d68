"""cidr_join longest-prefix-match semantics vs a brute-force reference."""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.net import cidr_join, ip_to_long, long_to_ip


def _brute(ips, nets):
    """{ip_row -> (plen, payload...)} by scanning every network row."""
    out = {}
    for row in ips:
        ip = row[0]
        best = None
        for net, plen, *payload in nets:
            if plen == 0 or (ip >> (32 - plen)) == (net >> (32 - plen)):
                cand = (plen, *payload)
                if best is None or cand > best:
                    best = cand
        if best is not None:
            out[row] = best
    return out


def test_cidr_join_matches_brute_force(spark):
    ips = [((i * 2654435761) % (1 << 32), i) for i in range(400)]
    nets = []
    for n in range(60):
        plen = (n * 5) % 33
        net = (n * 48271 * 65537) % (1 << 32)
        nets.append((net, plen, 64496 + n))
    ipdf = spark.createDataFrame(ips, "ip long, rid long")
    ndf = spark.createDataFrame(nets, "net long, plen int, asn long")
    got = {(r.ip, r.rid): (r.matched_plen, r.asn)
           for r in cidr_join(ipdf, ndf).collect()}
    assert got == _brute(ips, nets)
    assert got  # the /0 nets guarantee non-empty


def test_cidr_join_longest_and_ties(spark):
    # 10.0.0.0/8, 10.1.0.0/16 and a duplicate /16 with different asn:
    # the /16 wins over the /8; among the duplicate /16s the larger
    # payload struct (asn 9) wins deterministically
    ten = 10 << 24
    nets = [(ten, 8, 1), (ten | (1 << 16), 16, 2), (ten | (1 << 16), 16, 9)]
    ipdf = spark.createDataFrame([(ten | (1 << 16) | 5, 0), (ten | 7, 1),
                                  ((11 << 24), 2)], "ip long, rid long")
    ndf = spark.createDataFrame(nets, "net long, plen int, asn long")
    rows = {r.rid: (r.matched_plen, r.asn) for r in cidr_join(ipdf, ndf).collect()}
    assert rows == {0: (16, 9), 1: (8, 1)}  # rid 2: no cover -> dropped


def test_cidr_join_validation_and_empty(spark):
    ipdf = spark.createDataFrame([(1, 0)], "ip long, rid long")
    bad = spark.createDataFrame([(0, 40, 1)], "net long, plen int, asn long")
    with pytest.raises(ValueError, match=r"\[0, 32\]"):
        cidr_join(ipdf, bad)
    clash = spark.createDataFrame([(0, 8, 1)], "net long, plen int, rid long")
    with pytest.raises(ValueError, match="disjoint"):
        cidr_join(ipdf, clash)
    empty = spark.createDataFrame([], "net long, plen int, asn long")
    out = cidr_join(ipdf, empty)
    assert out.count() == 0
    assert out.columns == ["ip", "rid", "matched_plen", "asn"]


def test_ip_string_round_trip(spark):
    df = spark.createDataFrame([("1.2.3.4",), ("0.0.0.0",),
                                ("255.255.255.255",), ("192.168.0.1",)],
                               "s string")
    out = df.select("s", ip_to_long(F.col("s")).alias("v")) \
            .select("s", "v", long_to_ip(F.col("v")).alias("back")).collect()
    want = {"1.2.3.4": (1 << 24) + (2 << 16) + (3 << 8) + 4,
            "0.0.0.0": 0, "255.255.255.255": (1 << 32) - 1,
            "192.168.0.1": (192 << 24) + (168 << 16) + 1}
    for r in out:
        assert r.v == want[r.s]
        assert r.back == r.s


def test_cidr_join_broadcast_off_same_result(spark):
    ips = [((i * 99991) % (1 << 32), i) for i in range(100)]
    nets = [((n * 7919 * 524287) % (1 << 32), (n * 3) % 33, n)
            for n in range(25)]
    ipdf = spark.createDataFrame(ips, "ip long, rid long")
    ndf = spark.createDataFrame(nets, "net long, plen int, asn long")
    a = sorted(map(tuple, cidr_join(ipdf, ndf, broadcast_nets=True).collect()))
    b = sorted(map(tuple, cidr_join(ipdf, ndf, broadcast_nets=False).collect()))
    assert a == b == sorted((ip, rid, p, a_) for (ip, rid), (p, a_)
                            in _brute(ips, nets).items())
