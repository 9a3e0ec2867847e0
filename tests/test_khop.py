"""khop_sample (operators/graph.py): fanout cap on hub nodes, exact
deterministic replay vs an independent Python sampler, hop labeling,
direction handling, and the no-window/no-Python plan gate."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kgforge.operators.graph import khop_sample


@pytest.fixture(scope="module")
def graph(spark):
    rows = [("h", "e", f"x{i}") for i in range(30)]
    rows += [(f"x{i}", "e", f"y{i}_{j}") for i in range(30) for j in range(3)]
    rows += [("h", "other", "z")]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_fanout_cap_and_python_replay(spark, graph):
    seeds = spark.createDataFrame([("h",)], "seed string")
    res = khop_sample(graph, seeds, k=2, fanout=5, pred="e", salt="s0").collect()
    h1 = sorted(r.dst for r in res if r.hop == 1)
    assert len(h1) == 5
    # independent replay: 5 smallest md5(src|dst|salt) among h's 30 neighbors
    want = sorted(
        d for _, d in sorted((_md5(f"h|x{i}|s0"), f"x{i}") for i in range(30))[:5]
    )
    assert h1 == want
    # hop 2: each sampled x has 3 children (< fanout) -> all kept
    assert sum(1 for r in res if r.hop == 2) == 15
    # 'other' predicate excluded by the pred filter
    assert all(r.dst != "z" for r in res)


def test_determinism_and_epoch_salt(spark, graph):
    seeds = spark.createDataFrame([("h",)], "seed string")
    a = sorted(map(tuple, khop_sample(graph, seeds, k=1, fanout=5, pred="e", salt="s0").collect()))
    b = sorted(map(tuple, khop_sample(graph, seeds, k=1, fanout=5, pred="e", salt="s0").collect()))
    c = sorted(map(tuple, khop_sample(graph, seeds, k=1, fanout=5, pred="e", salt="s1").collect()))
    assert a == b
    assert a != c  # fresh sample per epoch salt


def test_direction_in(spark, graph):
    seeds = spark.createDataFrame([("x3",)], "seed string")
    res = khop_sample(graph, seeds, k=1, fanout=5, pred="e", direction="in").collect()
    assert [(r.src, r.dst) for r in res] == [("x3", "h")]


def test_converging_paths_dedup_frontier(spark):
    # two seeds reach the same node: its neighborhood samples ONCE per seed
    # but the frontier DISTINCT stops path-multiplicity blowup
    rows = [("a", "e", "m"), ("b", "e", "m"), ("m", "e", "t1"), ("m", "e", "t2")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    seeds = spark.createDataFrame([("a",), ("b",)], "seed string")
    res = khop_sample(t, seeds, k=2, fanout=10, pred="e").collect()
    h2 = sorted((r.seed, r.src, r.dst) for r in res if r.hop == 2)
    assert h2 == [
        ("a", "m", "t1"), ("a", "m", "t2"), ("b", "m", "t1"), ("b", "m", "t2"),
    ]


def test_no_window_no_python(spark, graph):
    from kgforge.plans.inspect import physical_plan

    seeds = spark.createDataFrame([("h",)], "seed string")
    plan = physical_plan(
        khop_sample(graph, seeds, k=2, fanout=5, pred="e"), mode="formatted"
    )
    # hub-safe: the per-src top-k is capped aggregation, never a Window sort
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
