"""Quality classifier (pyspark.ml logistic regression over hashed words)
and SemDeDup semantic dedup: separation/ranking semantics, determinism,
group-structure correctness, and the no-Python / bounded-driver gates."""

import math

import pytest
from pyspark.sql import functions as F

from kgforge.operators import classifier, similarity
from kgforge.plans import physical_plan

COOK = "butter flour sugar oven bake whisk fold batter dough knead"
FIN = "stock bond yield margin equity ledger audit tax rate basis"


@pytest.fixture(scope="module")
def model(spark):
    pos = spark.createDataFrame(
        [(i, " ".join(COOK.split()[i % 5 :]) ) for i in range(60)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(i, " ".join(FIN.split()[i % 5 :])) for i in range(60)],
        "doc_id long, text string",
    )
    return classifier.train_quality_classifier(pos, neg, n_features=1 << 14, max_iter=30)


def test_classifier_separates_domains(spark, model):
    docs = spark.createDataFrame(
        [(1, "butter oven bake dough"), (2, "bond ledger audit tax"),
         (3, "butter bond"), (4, None), (5, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.quality_prob for r in classifier.score_quality(docs, model).collect()}
    assert out[1] > 0.9 > out[3] > 0.1 > out[2]
    # empty/null text scores the prior, never crashes
    assert 0.0 <= out[4] <= 1.0 and math.isclose(out[4], out[5], abs_tol=1e-9)


def test_classifier_score_is_narrow_projection(spark, model):
    """Scale gate: scoring is one projection — no Exchange, no Python
    evaluator in the plan (HashingTF/LR transform stay JVM-side)."""
    docs = spark.createDataFrame([(1, COOK)], "doc_id long, text string")
    plan = physical_plan(classifier.score_quality(docs, model))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_classifier_auc_on_held_out(spark, model):
    held = [(i, COOK if i % 2 == 0 else FIN) for i in range(100, 140)]
    docs = spark.createDataFrame(held, "doc_id long, text string")
    rows = classifier.score_quality(docs, model).collect()
    pos = [r.quality_prob for r in rows if r.doc_id % 2 == 0]
    neg = [r.quality_prob for r in rows if r.doc_id % 2 == 1]
    assert min(pos) > max(neg)  # AUC = 1.0 on the separable fixture


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    import numpy as np

    rows = []
    for i in range(80):
        base = np.zeros(8)
        base[i % 4] = 1.0
        jitter = 0.001 * (i // 4) if i < 64 else 0.4 + 0.01 * i
        v = base + jitter * np.arange(8) / 8.0
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_groups_and_keepers(clustered_vecs):
    out = similarity.semantic_dedup(
        clustered_vecs, threshold=0.999, n_centroids=4, sample_size=128
    ).collect()
    assert len(out) == 80
    by_group = {}
    for r in out:
        by_group.setdefault(r.dup_group, []).append(r)
    # exactly one keeper per group, and it is the group's min id
    for g, members in by_group.items():
        keeps = [m for m in members if m.keep]
        assert len(keeps) == 1 and keeps[0].vec_id == g == min(m.vec_id for m in members)
    # the 64 tight vectors collapse into 4 big groups; the 16 scattered
    # tail vectors survive as singletons or tiny groups
    big = [g for g, m in by_group.items() if len(m) >= 10]
    assert len(big) == 4


def test_semantic_dedup_dedups_within_clusters_only(clustered_vecs):
    """Members of one dup_group always share a sem_cluster — the op never
    links across clusters (the SemDeDup contract that bounds the join)."""
    out = similarity.semantic_dedup(
        clustered_vecs, threshold=0.999, n_centroids=4, sample_size=128
    ).collect()
    seen = {}
    for r in out:
        seen.setdefault(r.dup_group, set()).add(r.sem_cluster)
    assert all(len(cl) == 1 for cl in seen.values())


def test_semantic_dedup_deterministic(clustered_vecs):
    a = sorted(map(tuple, similarity.semantic_dedup(
        clustered_vecs.repartition(7), threshold=0.999, n_centroids=4, sample_size=128
    ).collect()))
    b = sorted(map(tuple, similarity.semantic_dedup(
        clustered_vecs, threshold=0.999, n_centroids=4, sample_size=128
    ).collect()))
    assert a == b


def test_embed_decontaminate_flags_planted_leak(spark):
    import numpy as np

    def norm(v):
        v = np.asarray(v, float)
        return [float(x) for x in v / np.linalg.norm(v)]

    ev_rows = [(100, norm([1, 0, 0, 0])), (101, norm([0, 1, 0, 0]))]
    rows = [
        (1, norm([1, 0.01, 0, 0])),   # ~eval 100 -> contaminated
        (2, norm([0, 1, 0.02, 0])),   # ~eval 101 -> contaminated
        (3, norm([0, 0, 0, 1])),      # orthogonal -> clean
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ev = spark.createDataFrame(ev_rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in similarity.embed_decontaminate(corpus, ev, 0.95).collect()}
    assert out[1].is_contaminated and out[1].nearest_eval_id == 100
    assert out[2].is_contaminated and out[2].nearest_eval_id == 101
    assert not out[3].is_contaminated
    assert out[1].max_eval_cosine > 0.99


def test_embed_decontaminate_no_shuffle_plan(spark):
    import numpy as np

    rows = [(i, [float(x) for x in np.eye(4)[i % 4]]) for i in range(20)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ev = spark.createDataFrame(rows[:2], "vec_id long, embedding array<float>")
    plan = physical_plan(similarity.embed_decontaminate(corpus, ev))
    assert "Exchange" not in plan  # one narrow corpus pass, zero shuffles


def test_semantic_dedup_no_pairs_short_circuit(spark):
    # round 7: with every vector well-separated the pair set is empty and
    # the CC machinery is skipped — every row must still come back as its
    # own keeper group
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (int(i), (v / np.linalg.norm(v)).astype("float32").tolist())
        for i, v in enumerate(rng.standard_normal((40, 16)))
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semantic_dedup(
        e, threshold=0.999999, n_centroids=4, sample_size=16
    ).collect()
    assert len(out) == 40
    assert all(r.keep for r in out)
    assert all(r.dup_group == r.vec_id for r in out)
