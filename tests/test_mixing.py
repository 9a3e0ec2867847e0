"""Corpus mixing (kgforge.operators.mixing + jobs/mix_corpus.py):
deterministic content-keyed up/down-sampling per domain — the data-mixture
step between filtering and packing."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

from kgforge.operators import mixing

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"document body {i}", "en" if i % 2 == 0 else "fr")
            for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_mixture_counts_bounds_and_determinism(corpus):
    out = mixing.mixture_counts(corpus, {"en": 0.25, "fr": 2.5}).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.n_copies)
    # en: 0 or 1 copies; realized rate near 0.25 on 1000 uniform buckets
    assert set(by_lang["en"]) <= {0, 1}
    assert 0.18 < sum(by_lang["en"]) / len(by_lang["en"]) < 0.32
    # fr: 2 or 3 copies; realized near 2.5
    assert set(by_lang["fr"]) <= {2, 3}
    assert 2.4 < sum(by_lang["fr"]) / len(by_lang["fr"]) < 2.6
    again = mixing.mixture_counts(corpus, {"en": 0.25, "fr": 2.5}).collect()
    assert {(r.doc_id, r.n_copies) for r in again} == {
        (r.doc_id, r.n_copies) for r in out
    }


def test_mixture_edge_rates(corpus):
    zero = mixing.mixture_counts(corpus, {"en": 0.0, "fr": 0.0})
    assert zero.filter("n_copies > 0").count() == 0
    one = mixing.mixture_counts(corpus, {}, default_rate=1.0)
    assert one.filter("n_copies != 1").count() == 0
    exact2 = mixing.mixture_counts(corpus, {"en": 2.0, "fr": 2.0})
    assert exact2.filter("n_copies != 2").count() == 0
    with pytest.raises(ValueError, match="negative"):
        mixing.mixture_counts(corpus, {"en": -0.5})


def test_materialize_mixture_copies(corpus):
    mixed = mixing.materialize_mixture(corpus, {"en": 0.25, "fr": 2.5})
    rows = mixed.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.copy)
    counts = {r.doc_id: r.n_copies
              for r in mixing.mixture_counts(corpus, {"en": 0.25, "fr": 2.5}).collect()}
    for d, copies in per_doc.items():
        assert sorted(copies) == list(range(counts[d]))  # 0-based ordinals
    assert all(d in counts for d in per_doc)
    assert not any(counts[d] == 0 and d in per_doc for d in counts)
    # all original columns survive the explode
    assert {"doc_id", "text", "lang", "mix_bucket", "copy"} <= set(mixed.columns)


def test_salt_draws_independent_mixture(corpus):
    a = {r.doc_id for r in
         mixing.mixture_counts(corpus, {"en": 0.5, "fr": 0.5}).filter("n_copies > 0").collect()}
    b = {r.doc_id for r in
         mixing.mixture_counts(corpus, {"en": 0.5, "fr": 0.5}, salt="mix2")
         .filter("n_copies > 0").collect()}
    assert a != b  # different salts, different draws
    overlap = len(a & b) / max(len(a), 1)
    assert 0.3 < overlap < 0.7  # ~independent halves intersect near 50%


def test_mix_cli(spark, corpus, tmpdir_path, capsys):
    import mix_corpus

    p = os.path.join(tmpdir_path, "mix_docs.parquet")
    corpus.write.parquet(p)
    out = os.path.join(tmpdir_path, "mix_out")
    rc = mix_corpus.main(
        ["--docs", p, "--out", out, "--rates", "en=0.5,fr=2.0"]
    )
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["n_docs"] == 2000
    assert 0.4 < m["realized_rates"]["en"] < 0.6
    assert m["realized_rates"]["fr"] == 2.0  # integral rate is exact
    mixed = spark.read.parquet(os.path.join(out, "mixed"))
    assert mixed.filter("lang = 'fr'").count() == 2000  # 1000 docs x 2
    assert m["n_out"] == mixed.count()


def test_mix_cli_bad_rates(tmpdir_path):
    import mix_corpus

    with pytest.raises(SystemExit):
        mix_corpus.main(["--docs", "x", "--out", tmpdir_path, "--rates", "en:0.5"])


def test_shard_cli_writes_ordered_shards(spark, tmpdir_path, capsys):
    """shard_corpus CLI: every doc lands in exactly one shard partition,
    within-shard order follows the seeded pos, and sizes are balanced."""
    import json
    import shard_corpus

    p = os.path.join(tmpdir_path, "s_docs.parquet")
    spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(400)], "doc_id long, text string"
    ).write.parquet(p)
    out = os.path.join(tmpdir_path, "s_out")
    rc = shard_corpus.main(["--docs", p, "--out", out, "--shards", "4"])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["n_docs"] == 400 and m["n_shards"] == 4
    assert m["max_shard"] < 2 * m["min_shard"]
    shards = spark.read.parquet(os.path.join(out, "shards"))
    assert shards.count() == 400
    assert shards.select("doc_id").distinct().count() == 400
    # shard assignment matches the operator exactly (reproducible epoch)
    from kgforge.operators import mixing as mx

    docs = spark.read.parquet(p)
    expect = {(r.doc_id): (r.shard, r.pos) for r in mx.shuffle_shards(docs, 4).collect()}
    got = {(r.doc_id): (r.shard, r.pos) for r in shards.select("doc_id", "shard", "pos").collect()}
    assert got == expect
