"""CIDR longest-prefix match — operators/ipmatch.py."""
import pytest


def _ip(a, b, c, d):
    return (a << 24) | (b << 16) | (c << 8) | d


def test_cidr_longest_prefix_wins(spark):
    from cartwright_spark.operators.ipmatch import cidr_lookup
    # 10.0.0.0/8 (block 1) and 10.1.0.0/16 (block 2): an ip inside
    # 10.1.x.x must match the /16, other 10.x the /8
    blocks = spark.createDataFrame(
        [(8, 10, 1), (16, (10 << 8) | 1, 2)],
        "plen int, prefix long, block_id long")
    ips = spark.createDataFrame(
        [(_ip(10, 1, 2, 3),), (_ip(10, 9, 9, 9),), (_ip(11, 0, 0, 1),)],
        "ip long")
    out = {r.ip: (r.plen, r.block_id)
           for r in cidr_lookup(ips, blocks, [8, 16]).collect()}
    assert out[_ip(10, 1, 2, 3)] == (16, 2)
    assert out[_ip(10, 9, 9, 9)] == (8, 1)
    assert _ip(11, 0, 0, 1) not in out       # unmatched ips drop out


def test_cidr_duplicate_blocks_dedupe_to_min(spark):
    from cartwright_spark.operators.ipmatch import cidr_lookup
    blocks = spark.createDataFrame(
        [(8, 10, 7), (8, 10, 3)], "plen int, prefix long, block_id long")
    ips = spark.createDataFrame([(_ip(10, 0, 0, 1),)], "ip long")
    out = cidr_lookup(ips, blocks, [8]).collect()
    assert out[0].block_id == 3


def test_cidr_validation_and_broadcast_plan(spark):
    from cartwright_spark.operators.ipmatch import cidr_lookup
    blocks = spark.createDataFrame([(8, 10, 1)],
                                   "plen int, prefix long, block_id long")
    ips = spark.createDataFrame([(_ip(10, 0, 0, 1),)], "ip long")
    with pytest.raises(ValueError, match="plens"):
        cidr_lookup(ips, blocks, [])
    with pytest.raises(ValueError, match="prefix lengths"):
        cidr_lookup(ips, blocks, [40])
    plan = (cidr_lookup(ips, blocks, [8])
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastExchange" in plan and "SortMergeJoin" not in plan
