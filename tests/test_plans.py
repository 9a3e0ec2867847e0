"""Physical-plan discipline gates (SURVEY.md 4.2): pushdown, pruning,
broadcast, top-k, partial aggregation, filter-before-UDF staging.  A plan
regression (e.g. a filter silently stops reaching the parquet scan) fails
here instead of surfacing as a 100TB-scale slowdown."""

import pytest
from pyspark.sql import functions as F

from kgforge.plans import physical_plan
from kgforge.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return REGISTRY[name][0](spark, SF)


def test_filter_pushdown_reaches_scan(spark):
    plan = physical_plan(_q(spark, "scan_project"))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark):
    plan = physical_plan(_q(spark, "scan_project"))
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "l_orderkey" in read_schema
    assert "l_comment" not in read_schema and "l_returnflag" not in read_schema


def test_broadcast_join_used(spark):
    assert "BroadcastHashJoin" in physical_plan(_q(spark, "join_broadcast"))


def test_entity_linking_join_is_broadcast(spark):
    """The 10^12-row fact side must never shuffle for linking (SURVEY.md J1):
    both surface joins are broadcast, and no SortMergeJoin appears."""
    from kgforge.corpus import generate_rows
    from kgforge.operators.extract import extract_parse_df, prefilter, with_content_sha
    from kgforge.operators.linking import link_terms
    from kgforge.operators.triples import explode_tps
    from kgforge.pipeline import default_entity_dict

    src = spark.createDataFrame(generate_rows(40)[0])
    parsed = extract_parse_df(prefilter(with_content_sha(src)))
    linked = link_terms(explode_tps(parsed), default_entity_dict(spark))
    plan = physical_plan(linked)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # ranked-dict lineage is truncated by localCheckpoint: the crossJoin +
    # window ranking is computed ONCE, not re-run per broadcast side
    assert "Window" not in plan and "CartesianProduct" not in plan
    assert plan.count("ExistingRDD") >= 2 or plan.count("Scan ExistingRDD") >= 2


def test_linking_probe_reduction_plan_and_equivalence(spark):
    """SURVEY.md 4.3.2 semi-join reduction (reduce_probe=True): the relation
    broadcast to the fact side must be built from the fact side's DISTINCT
    (surface, etype_key) pairs probing the dict — and the linked output must
    be row-identical to the plain broadcast mode."""
    from kgforge.corpus import generate_rows
    from kgforge.operators.extract import extract_parse_df, prefilter, with_content_sha
    from kgforge.operators.linking import link_terms
    from kgforge.operators.triples import explode_tps
    from kgforge.pipeline import default_entity_dict

    src = spark.createDataFrame(generate_rows(60)[0])
    exploded = explode_tps(
        extract_parse_df(prefilter(with_content_sha(src)))
    ).localCheckpoint(eager=True)
    ed = default_entity_dict(spark)

    reduced = link_terms(exploded, ed, reduce_probe=True)
    # the reduced-dict relation is materialized by localCheckpoint, so its
    # distinct probe ran as its OWN job; the fact-side output plan must
    # still be pure broadcast (no shuffle of the big side)
    plan = physical_plan(reduced)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan

    # building the reduced dict itself must aggregate the distinct probe
    # (HashAggregate over surface+etype_key feeding the join)
    from kgforge.operators.linking import NO_ETYPE, best_entity_per_surface

    etype_key = F.coalesce(F.col("exp_etype"), F.lit(NO_ETYPE))
    probes = (
        exploded.select(F.col("s_surface").alias("surface"), etype_key.alias("etype_key"))
        .unionByName(
            exploded.select(F.col("o_surface").alias("surface"), etype_key.alias("etype_key"))
        )
        .filter(F.col("surface").isNotNull())
        .distinct()
    )
    probe_plan = physical_plan(probes.join(best_entity_per_surface(ed), ["surface", "etype_key"]))
    assert "HashAggregate" in probe_plan and "surface" in probe_plan

    plain = link_terms(exploded, ed, reduce_probe=False)
    cols = ["subj", "pred", "obj", "content_sha256", "tp_pos", "bgp_hash"]
    assert sorted(map(tuple, reduced.select(cols).collect())) == sorted(
        map(tuple, plain.select(cols).collect())
    )


def test_topk_avoids_global_sort(spark):
    plan = physical_plan(_q(spark, "sort_global"))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_salted_agg_is_two_phase(spark):
    plan = physical_plan(_q(spark, "join_salted_count"))
    # partial (keys+salt), final-of-partial, then partial+final over keys
    assert plan.count("HashAggregate") >= 3


def test_prefilter_stays_below_python_stage(spark):
    """SURVEY.md 4.1: the cheap JVM contains/rlike must execute BEFORE the
    Arrow Python stage.  Parents print first in the tree, so the Python node
    must appear at a smaller offset than its child Filter."""
    from kgforge.corpus import generate_rows
    from kgforge.operators.extract import extract_parse_df, prefilter, with_content_sha

    src = spark.createDataFrame(generate_rows(40)[0])
    parsed = extract_parse_df(prefilter(with_content_sha(src)))
    plan = physical_plan(parsed, mode="simple")
    i_py = max(plan.find("MapInPandas"), plan.find("FlatMapGroupsInPandas"), plan.find("PythonMapInArrow"))
    i_filter = plan.find("Filter")
    assert i_py != -1 and i_filter != -1
    assert i_py < i_filter, "prefilter must be a child of (execute before) the Python stage"


def test_partial_aggregation_before_shuffle(spark):
    plan = physical_plan(_q(spark, "agg_dedup"))
    # partial HashAggregate -> Exchange -> final HashAggregate
    first_agg = plan.find("HashAggregate")
    assert first_agg != -1
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_covers_scan(spark):
    plan = physical_plan(_q(spark, "fn_math"), mode="simple")
    assert "*(1)" in plan or "WholeStageCodegen" in plan


def test_merged_window_entry_shares_one_shuffle(spark):
    """win_lag_running merges W2 (lag) and W4 (running frame) over the same
    partitioning: the plan must contain exactly ONE exchange — the merge's
    whole point is that both window functions ride one shuffle."""
    import re

    plan = physical_plan(_q(spark, "win_lag_running"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_asof_join_is_single_window_no_join(spark):
    """J8 as-of: one shuffle on user_id + an ordered window — no range join,
    no cartesian, no re-aggregation join (the scalable as-of form)."""
    plan = physical_plan(_q(spark, "join_asof"))
    assert "Window" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan
    # formatted mode numbers operators: exactly one shuffle node "(n) Exchange"
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_chunk_staging_read_is_partition_pruned(spark, tmpdir_path):
    """run_chunked's per-chunk read must prune to its own kg_chunk directory
    (file-listing pruning), not scan the full staged table."""
    from kgforge.checkpoint import with_pid
    from kgforge.corpus import generate_rows
    from kgforge.operators.extract import with_content_sha

    src = with_pid(with_content_sha(spark.createDataFrame(generate_rows(80)[0])), 16)
    staged_path = tmpdir_path + "/staged"
    src.withColumn("kg_chunk", F.pmod(F.col("kg_pid"), F.lit(4))).write.partitionBy(
        "kg_chunk"
    ).parquet(staged_path)
    staged = spark.read.parquet(staged_path)
    plan = physical_plan(staged.filter(F.col("kg_chunk") == 2).drop("kg_chunk"))
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:120]
    assert "kg_chunk" in pf


@pytest.mark.parametrize("name", ["dedup_minhash", "dedup_ngram_jaccard"])
def test_dedup_candidates_via_equi_join(spark, name):
    """Candidate generation must be a hash-partitioned equi-join, never a
    cartesian product."""
    plan = physical_plan(REGISTRY[name][0](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_signatures_have_no_lane_explode(spark):
    """Round-4 array-lane form: the ONLY Generate in the signature plan is
    the shingle explode — no explode(sequence(...)) lane multiplication
    (the r2/r3 form shuffled 16x the shingle rows), and exactly one
    aggregation pair (partial+final min) keyed on the doc id."""
    from kgforge.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(dedup.minhash_signatures(docs))
    assert "explode(sequence(" not in plan
    n_generate = plan.count(") Generate")
    assert n_generate == 1, f"expected one explode (shingles), saw {n_generate}"


def test_minhash_guard_fallback_detects_lost_docs_on_ids_only(spark):
    """The round-5 guard fallback must find guard-lost docs by anti-joining
    IDS, never the text-bearing docs relation: shuffling the corpus text
    column to compute an (almost always empty) lost-id set measured as a
    1.8x slowdown of the whole pair job.  Gate: every exchange feeding a
    join in the pair plan is text-free except the (bounded) verify-side
    semi-join fetches."""
    from kgforge.operators import dedup
    from kgforge.operators.dedup import _guard_lost_star_edges, band_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    band = band_signatures(docs, 16, 4, 3, 1000)
    plan = physical_plan(_guard_lost_star_edges(docs, band, "doc_id"))
    # exactly one LeftAnti (lost detection), and its join keys/output carry
    # ids only — text may enter the plan solely through the LeftSemi fetch
    # of the lost docs
    anti_ix = plan.find("Join type: LeftAnti")
    assert anti_ix >= 0, "expected a LeftAnti join (lost-doc detection)"
    anti_block = plan[anti_ix:anti_ix + 400]
    assert "text" not in anti_block, "lost-doc anti join must not carry text"
    assert "Join type: LeftSemi" in plan  # the bounded text fetch
    # the anti join's left input is a 1-column id projection of the scan:
    # no plan node between the scan and the anti join may reference text
    # except under the semi join — approximate by checking the projected
    # ReadSchema of the id-side scan
    id_scans = [seg for seg in plan.split("ReadSchema: ")[1:] if seg[:200].startswith("struct<doc_id")]
    assert any("text" not in seg[:80] for seg in id_scans), (
        "expected an id-only parquet scan feeding the lost-doc anti join"
    )


def test_unigram_lm_hot_words_take_broadcast_join(spark):
    """The Zipf-head split: the vocabulary head joins broadcast (hot words
    never shuffle on the word key) and a tiny head_size forces real rows
    down both paths while keeping results identical to the plain join."""
    from kgforge.operators import text

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = text.unigram_logprob(docs, head_size=5)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    # equivalence: head/tail split must not change any score
    from pyspark.sql import functions as F

    w = docs.select("doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")).filter(
        F.length("word") > 0
    )
    vf = w.groupBy("word").agg(F.count("*").alias("c"))
    tot = vf.agg(F.sum("c").alias("t"))
    plain = (
        w.join(vf, "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log(F.col("c") / F.col("t"))), 5).alias("avg_logprob"),
            F.count("*").alias("n_words"),
        )
    )
    got = {r.doc_id: (r.avg_logprob, r.n_words) for r in df.collect()}
    want = {r.doc_id: (r.avg_logprob, r.n_words) for r in plain.collect()}
    assert got == want


def test_dedup_clusters_rep_election_is_text_free(spark):
    """VERDICT r5 item 2: the exact-content rep collapse elects reps from an
    (id, md5) projection — no exchange in the election plan may carry the
    text column, and no any_value(text) aggregate exists anywhere.  Text
    enters only through the left-semi rep fetch."""
    from kgforge.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    star, reps = dedup.exact_rep_collapse(docs)
    plan = physical_plan(star)
    assert "any_value" not in plan
    # formatted mode: each "(n) Exchange" has a detail block whose Input
    # line lists the exchanged columns — all must be text-free
    for block in plan.split("\n\n"):
        if block.startswith("(") and ") Exchange" in block.splitlines()[0]:
            assert "text" not in block, f"text-bearing exchange:\n{block}"
    # the rep fetch is the one place text flows, via a semi join
    assert "Join type: LeftSemi" in physical_plan(reps)


def test_audit_signals_rules_only_has_no_exchange(spark):
    """VERDICT r5 item 5: the filter CLI's per-row narrow signals (quality
    rules + langid) fuse into ONE projection — zero Exchange nodes, so a
    rules-only corpus filter is a single scan."""
    from kgforge.operators import text

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(text.audit_signals(docs, include_lang=True))
    assert "Exchange" not in plan, plan
    # fused values match the standalone operators exactly
    fused = {r.doc_id: (r.ok_rules, r.pred_lang)
             for r in text.audit_signals(docs, include_lang=True).collect()}
    rules = {r.doc_id: r.keep for r in text.quality_rules(docs).collect()}
    langs = {r.doc_id: r.pred_lang for r in text.langid(docs).collect()}
    assert fused == {d: (rules[d], langs[d]) for d in rules}


def test_mixture_is_exchange_free(spark):
    """Corpus mixing is one narrow projection + explode: the rate map is a
    literal CASE chain, the decision a content hash — zero Exchange nodes
    regardless of how many domains are listed."""
    from kgforge.operators import mixing

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(
        mixing.materialize_mixture(docs, {"en": 0.25, "fr": 2.5, "de": 0.5})
    )
    assert "Exchange" not in plan, plan
