"""Benchmark harness (driver contract: prints ONE JSON line).

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the KG-construction pipeline itself on a
deterministically generated corpus (the BASELINE.md files/sec metric).

Output: {"metric": "sum_of_query_medians_sec", "value": N, "unit": "sec",
         "queries": {...per-query MEDIAN sec...}, "sf": 0.1,
         "kg_files_per_sec": N}
"value" is the SUM OF PER-QUERY MEDIANS (rep-count-invariant; the raw
multi-rep loop wall is reported separately as wall_all_reps_sec).
ADVICE r3: the metric NAME now says what the value is — r1/r2 reported a
true single-pass wall under "total_wall_sec", r3 reported median-sums under
the same name; comparisons across that boundary carry a measurement-change
discontinuity (documented in BENCH.md).

Every query (and the pipeline) runs KGFORGE_BENCH_REPS times (default 3);
"queries" carries medians and "spread" the per-query max-min, so
round-over-round deltas are interpretable against this host's measured
±15-25% run-to-run noise (VERDICT r2 item 8).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "scan_project",
    "join_broadcast",
    "join_sortmerge",
    "join_range",
    "agg_dedup",
    "agg_rollup_cube",
    "win_lag_running",
    "win_rank_candidates",
    "sort_global",
    "fn_math",
    "join_asof",
    "dedup_exact",
    "dedup_minhash",
    "dedup_embed_lsh",
    "ann_cosine_topk",
    "text_quality",
    "dedup_clusters_exact",  # round 3: CC cluster assignment (exact-clique pairs)
]

# Round-6 corpus-assembly ops, benched OUTSIDE the headline sum (1 rep,
# "queries_extra") so the headline stays comparable round-over-round while
# the new operators' sf0.1 walls are still on record.  Disable with
# KGFORGE_BENCH_EXTRA=0.
EXTRA = [
    "dedup_paragraphs",
    "dsir_weights",
    "corpus_shuffle",
    "tokenize_bpe",
    "text_decontaminate",
    "decontaminate_strip",
    "pii_scrub",
    "semantic_dedup",
    "quality_classifier",
    "corpus_mix",
    # round-6 third session: substring dedup, graph analytics, corpus stats
    "dedup_substring",
    "kg_void_stats",
    "kg_pagerank",
    "kg_path_2hop",
    "kg_schema_infer",
    "kg_negative_samples",
    "kg_link_embed",
    "text_vocab_topk",
    "text_length_stats",
    "text_postings",
    "text_keywords",
    # round-6 fourth session: SPARQL answering + exact transitive closure
    "kg_bgp_eval",
    "kg_bgp_optional",
    "kg_bgp_union",
    "kg_bgp_minus",
    "kg_bgp_filter",
    "kg_path_closure",
    "kg_construct",
    "kg_ntriples_roundtrip",
    "kg_khop_sample",
    "kg_bgp_values",
    "kg_describe",
    "kg_bgp_agg",
    "kg_bgp_bind",
    "kg_bgp_groupconcat",
    "kg_sparql_closure",
    "kg_sparql_alt",
    "kg_bgp_incremental",
    "kg_bgp_exists",
    "kg_sparql_zeroone",
]

# 480k rows (~40MB, multi-file): large enough that files/sec reflects the
# engine instead of fixed job overhead (60k rows: 3.9k f/s; 480k: ~19k f/s)
KG_CORPUS_ROWS = int(os.environ.get("KGFORGE_BENCH_ROWS", "480000"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from kgforge import pipeline
    from kgforge.conf import get_spark
    from kgforge.corpus import write_corpus_parquet
    from kgforge.queries import REGISTRY

    spark = get_spark("kgforge-bench", master=f"local[{cpus}]")

    # warm the session (JVM/codegen/Arrow worker startup out of the measurement)
    spark.range(1000).selectExpr("sum(id)").collect()

    # KG corpus generated/cached BEFORE the measured window (generation is
    # single-threaded test-fixture work, not engine throughput)
    from kgforge.corpus import CORPUS_VERSION

    corpus_path = f"/tmp/kgforge_bench_corpus_v{CORPUS_VERSION}_{KG_CORPUS_ROWS}.parquet"
    if not os.path.exists(corpus_path):
        write_corpus_parquet(corpus_path, KG_CORPUS_ROWS)

    reps = int(os.environ.get("KGFORGE_BENCH_REPS", "3"))
    q_secs: dict = {}
    q_spread: dict = {}
    t_total = time.time()
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        walls = []
        for _ in range(reps):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        q_secs[name] = round(statistics.median(walls), 3)
        q_spread[name] = round(max(walls) - min(walls), 3)

    extra_secs: dict = {}
    if os.environ.get("KGFORGE_BENCH_EXTRA", "1") != "0":
        for name in EXTRA:
            fn, _ = REGISTRY[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            extra_secs[name] = round(time.time() - t0, 3)

    src = spark.read.parquet(corpus_path)
    kg_walls = []
    for i in range(reps):
        out_dir = f"/tmp/kgforge_bench_out_{i}"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        pipeline.run(spark, src, out_dir, n_parts=64, resume=False, run_id=f"bench{i}")
        kg_walls.append(time.time() - t0)
    kg_wall = statistics.median(kg_walls)
    q_secs["kg_pipeline"] = round(kg_wall, 3)
    q_spread["kg_pipeline"] = round(max(kg_walls) - min(kg_walls), 3)

    # headline value = sum of per-query MEDIANS: comparable round-over-round
    # regardless of the rep count (the raw loop wall grows linearly with
    # reps and would read as a regression when reps change)
    total = sum(q_secs.values())
    print(
        json.dumps(
            {
                "metric": "sum_of_query_medians_sec",
                "value": round(total, 3),
                "unit": "sec",
                "wall_all_reps_sec": round(time.time() - t_total, 3),
                "queries": q_secs,
                "queries_extra": extra_secs,
                "spread": q_spread,
                "reps": reps,
                "sf": sf,
                "kg_corpus_rows": KG_CORPUS_ROWS,
                "kg_files_per_sec": round(KG_CORPUS_ROWS / kg_wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
