"""EP-3 CLI: the production entry point [B:6].

    spark-submit --py-files kgforge.zip jobs/build_graph.py \
        --source <parquet-or-iceberg-table> --out <dir> \
        [--entity-dict <parquet>] [--n-parts 4096] [--no-resume]

Local smoke (no spark-submit needed — builds its own session):

    python jobs/build_graph.py --corpus-rows 5000 --out /tmp/kg_cli
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kgforge KG-construction pipeline")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--source", help="parquet path of the source_files table")
    src.add_argument(
        "--corpus-rows", type=int, help="generate a deterministic synthetic corpus of N rows"
    )
    ap.add_argument("--out", required=True, help="output directory (catalog root)")
    ap.add_argument("--entity-dict", help="parquet path: surface,entity_id,prior,etype")
    ap.add_argument("--n-parts", type=int, default=256, help="checkpoint partition count")
    ap.add_argument("--no-resume", action="store_true", help="ignore existing checkpoints")
    ap.add_argument(
        "--compact-checkpoints",
        action="store_true",
        help="after the run, rewrite the checkpoint log to one row per "
        "(stage, pid) — keeps long-lived out dirs' resume anti-join O(pids)",
    )
    ap.add_argument("--master", default=None, help="spark master (default: env/local)")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from kgforge import pipeline

    active = SparkSession.getActiveSession()
    if active is not None:  # under spark-submit the session/conf come from the cluster
        spark = active
    else:
        from kgforge.conf import get_spark

        spark = get_spark("kgforge-build-graph", master=args.master)

    if args.source:
        source = spark.read.parquet(args.source)
    else:
        from kgforge.corpus import generate_rows

        source = spark.createDataFrame(generate_rows(args.corpus_rows)[0])

    entity_dict = spark.read.parquet(args.entity_dict) if args.entity_dict else None

    metrics = pipeline.run(
        spark,
        source,
        args.out,
        entity_dict=entity_dict,
        n_parts=args.n_parts,
        resume=not args.no_resume,
        run_id=args.run_id,
    )
    if args.compact_checkpoints:
        import os as _os

        from kgforge.checkpoint import CheckpointStore

        store = CheckpointStore(spark, _os.path.join(args.out, "checkpoints"))
        metrics["checkpoint_rows_compacted"] = store.compact()
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
