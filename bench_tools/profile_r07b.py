"""Stage-level profiling for the round-7 continuation session (guide §1).

Times the internals the bench can't see: kg_pipeline per-stage metrics and
a decomposition of negative_samples / path_compose / pagerank into their
constituent actions (each isolated with the noop sink).  Read-only on the
repo; not part of any measurement contract.

Usage: python bench_tools/profile_r07b.py <target> [sf_dir]
Targets: pipeline, negs, path2hop, pagerank
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kgforge.conf import get_spark  # noqa: E402


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    target = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("kgforge-profile", master=f"local[{cpus}]")
    spark.range(1000).selectExpr("sum(id)").collect()

    if target == "pipeline":
        import shutil

        from kgforge import pipeline
        from kgforge.corpus import CORPUS_VERSION, write_corpus_parquet

        rows = 480_000
        corpus = f"/tmp/kgforge_bench_corpus_v{CORPUS_VERSION}_{rows}.parquet"
        if not os.path.exists(corpus):
            write_corpus_parquet(corpus, rows)
        src = spark.read.parquet(corpus)
        for i in range(int(os.environ.get("REPS", "3"))):
            out = f"/tmp/kgforge_prof_out_{i}"
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            m = pipeline.run(spark, src, out, n_parts=64, resume=False,
                             run_id=f"prof{i}")
            wall = round(time.time() - t0, 2)
            print(json.dumps({"wall": wall, **{
                k: v for k, v in m.items()
                if isinstance(v, (int, float)) and (
                    k.startswith("t_") or k.endswith("_s"))
            }}))

    elif target == "negs":
        from kgforge.queries import _dm_triples

        tri = _dm_triples(spark, sf_dir)
        spark.sparkContext.setJobDescription("ents distinct")
        t = {}
        t0 = time.time()
        ents = (
            tri.select(F.col("subj").alias("e"))
            .union(tri.select(F.col("obj").alias("e")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        t["ents_distinct"] = round(time.time() - t0, 2)
        t["n_ents"] = ents.count()
        from kgforge.operators.graph import negative_samples

        spark.sparkContext.setJobDescription("full negative_samples")
        t0 = time.time()
        t["full"] = noop(negative_samples(_dm_triples(spark, sf_dir), k=2))
        # anti-join ablation: same pipeline but STOP before the anti join
        print(json.dumps(t))

    elif target == "path2hop":
        from kgforge.operators.graph import path_compose
        from kgforge.queries import _dm_triples

        for rep in range(3):
            t0 = time.time()
            df = path_compose(_dm_triples(spark, sf_dir),
                              ["placed_by", "in_nation"])
            print("rep", rep, noop(df))

    elif target == "pagerank":
        from kgforge.operators.graph import pagerank
        from kgforge.queries import REGISTRY

        fn, _ = REGISTRY["kg_pagerank"]
        for rep in range(3):
            print("rep", rep, noop(fn(spark, sf_dir)))

    spark.stop()


if __name__ == "__main__":
    main()
