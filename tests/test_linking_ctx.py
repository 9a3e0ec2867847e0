"""Context scoring for entity linking (linking.corpus_context_priors):
corpus-level etype co-occurrence must disambiguate surfaces in UNTYPED
slots, leave typed-slot behavior intact, and stay entirely dim-side
(fact-side plan remains broadcast-only)."""

from pyspark.sql import functions as F

from kgforge.operators.linking import (
    best_entity_per_surface,
    corpus_context_priors,
    link_terms,
)

# "paris" is ambiguous: person sense has the HIGHER raw prior, city sense is
# what the corpus overwhelmingly uses.
DICT_ROWS = [
    ("paris", "<dbr:Paris>", 0.6, "city"),
    ("paris", "<dbr:Paris_Hilton>", 0.7, "person"),
    ("berlin", "<dbr:Berlin>", 0.9, "city"),
]

EXPLODED_SCHEMA = (
    "s_r string, p_r string, o_r string, s_kind string, p_kind string, "
    "o_kind string, s_surface string, o_surface string, exp_etype string"
)


def _exploded(spark, rows):
    return spark.createDataFrame(rows, EXPLODED_SCHEMA)


def _tp(s_surface, exp_etype):
    return (
        f"<x:{s_surface}>", "<x:p>", '"o"', "iri", "iri", "literal",
        s_surface, None, exp_etype,
    )


def test_affinity_shares_sum_per_surface(spark):
    ex = _exploded(spark, [_tp("paris", "city")] * 9 + [_tp("paris", None)])
    aff = {(r.surface, r.etype): r.affinity for r in corpus_context_priors(ex).collect()}
    assert aff[("paris", "city")] == 0.9
    assert aff[("paris", "~")] == 0.1


def test_context_flips_untyped_slot_only(spark):
    ed = spark.createDataFrame(DICT_ROWS, "surface string, entity_id string, prior double, etype string")
    ex = _exploded(spark, [_tp("paris", "city")] * 9 + [_tp("paris", None)])
    priors = corpus_context_priors(ex)

    def winner(best_df, etype_key):
        return {
            r.etype_key: r.entity_id
            for r in best_df.filter(F.col("surface") == "paris").collect()
        }[etype_key]

    base = best_entity_per_surface(ed)
    ctx = best_entity_per_surface(ed, priors)
    # untyped slot: raw prior picks the person; corpus evidence flips to city
    assert winner(base, "~") == "<dbr:Paris_Hilton>"
    assert winner(ctx, "~") == "<dbr:Paris>"
    # typed slot: the per-slot etype match already decides; context agrees
    assert winner(base, "city") == "<dbr:Paris>"
    assert winner(ctx, "city") == "<dbr:Paris>"


def test_pipeline_flag_runs_with_context_priors(spark, tmpdir_path):
    """use_context_priors=True threads corpus priors through the full
    pipeline: mention extraction is unaffected, linking still emits the
    full fixture rowset."""
    from kgforge import pipeline
    from kgforge.corpus import generate_rows

    src = spark.createDataFrame(generate_rows(120)[0])
    m_off = pipeline.run(spark, src, tmpdir_path + "/off", n_parts=8, resume=False)
    m_on = pipeline.run(
        spark, src, tmpdir_path + "/on", n_parts=8, resume=False, use_context_priors=True
    )
    assert m_on["n_mentions"] == m_off["n_mentions"]
    assert m_on["n_fixture_triples"] > 0


def test_link_terms_default_unchanged_and_plan_broadcast_only(spark):
    ed = spark.createDataFrame(DICT_ROWS, "surface string, entity_id string, prior double, etype string")
    ex = _exploded(spark, [_tp("paris", "city")] * 3 + [_tp("berlin", None)])
    plain = link_terms(ex, ed).select("subj", "pred", "obj").collect()
    again = link_terms(ex, ed, context_priors=None).select("subj", "pred", "obj").collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, again))

    linked = link_terms(ex, ed, context_priors=corpus_context_priors(ex))
    plan = linked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # untyped berlin slot still links (single candidate, context or not)
    assert {r.subj for r in linked.filter(F.col("s_surface") == "berlin").collect()} == {"<dbr:Berlin>"}


# ---------------------------------------------------------- embedding link


def test_link_by_embedding_picks_nearest_and_nils(spark):
    from kgforge.operators import linking

    mentions = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),  # best cosine is negative -> NIL at 0.5
        ],
        "mention_id long, embedding array<double>",
    )
    ents = spark.createDataFrame(
        [(100, [0.9, 0.1]), (200, [0.1, 0.9])],
        "entity_id long, embedding array<double>",
    )
    out = {
        r.mention_id: (r.entity_id, r.cosine)
        for r in linking.link_by_embedding(mentions, ents, threshold=0.5).collect()
    }
    assert out[1][0] == 100 and out[2][0] == 200
    assert out[3][0] is None  # NIL below threshold, row still present


def test_link_by_embedding_tie_breaks_on_entity_id(spark):
    from kgforge.operators import linking

    mentions = spark.createDataFrame(
        [(1, [1.0, 1.0])], "mention_id long, embedding array<double>"
    )
    ents = spark.createDataFrame(
        [(7, [2.0, 2.0]), (3, [5.0, 5.0])],  # identical cosines -> min id
        "entity_id long, embedding array<double>",
    )
    (row,) = linking.link_by_embedding(mentions, ents).collect()
    assert row.entity_id == 3
