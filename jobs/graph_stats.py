"""Graph analytics CLI: materialized triple table -> dataset description,
schema induction, entity ranking.

    spark-submit --py-files kgforge.zip jobs/graph_stats.py \
        --triples <triples.parquet> --out <dir> \
        [--type-pred rdf_type] [--pagerank-pred PRED [--pagerank-iters 5]] \
        [--path p1,p2,^p3]

The consumer-side companion to jobs/build_graph.py: once the pipeline has
materialized (subj, pred, obj) triples, this job answers "what is in this
graph" in one pass per product:

    void/      per-predicate VoID property-partition statistics
               (kgforge.operators.graph.void_stats)
    schema/    dominant (subject class, object class) signature per
               predicate (graph.schema_infer; --type-pred names the
               typing predicate)
    ranks/     optional: PageRank over ONE predicate's edges
               (--pagerank-pred; graph.pagerank)
    path/      optional: distinct (subj, obj) pairs of a sequence property
               path (--path, comma-separated steps, '^' prefix = inverse;
               graph.path_compose)
    negatives/ optional: K deterministic corrupt-object negatives per
               triple for KG-embedding training (--negatives K
               [--neg-salt EPOCH]; graph.negative_samples)

and prints ONE JSON metrics line (n_triples, n_predicates, plus the row
counts of each requested product).

Local smoke (build a graph first, then describe it):

    python jobs/build_graph.py --corpus-rows 400 --out /tmp/kg_g
    python jobs/graph_stats.py --triples /tmp/kg_g/triples --out /tmp/kg_gs
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kgforge graph analytics")
    ap.add_argument("--triples", required=True, help="parquet: subj, pred, obj")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--type-pred", default="rdf_type", help="typing predicate")
    ap.add_argument(
        "--pagerank-pred",
        default=None,
        help="rank entities over this predicate's edges (subj -> obj)",
    )
    ap.add_argument("--pagerank-iters", type=int, default=5)
    ap.add_argument(
        "--path",
        default=None,
        help="sequence property path, COMMA-separated steps ('^' prefix "
        "inverts a step; commas, unlike SPARQL's '/', cannot collide with "
        "the slashes inside IRI predicates)",
    )
    ap.add_argument(
        "--negatives",
        type=int,
        default=None,
        metavar="K",
        help="emit K deterministic corrupt-object negatives per triple "
        "(filtered setting; graph.negative_samples) to negatives/",
    )
    ap.add_argument("--neg-salt", default="neg1", help="negative-sampling epoch salt")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from kgforge.conf import get_spark

        spark = get_spark("kgforge-graph-stats", master=args.master)

    from kgforge.operators import graph

    triples = spark.read.parquet(args.triples)

    void = graph.void_stats(triples)
    void.write.mode("overwrite").parquet(os.path.join(args.out, "void"))
    schema = graph.schema_infer(triples, type_pred=args.type_pred)
    schema.write.mode("overwrite").parquet(os.path.join(args.out, "schema"))

    n_ranked = None
    if args.pagerank_pred:
        edges = triples.filter(F.col("pred") == args.pagerank_pred).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        ranks = graph.pagerank(edges, iters=args.pagerank_iters)
        ranks.write.mode("overwrite").parquet(os.path.join(args.out, "ranks"))
        n_ranked = spark.read.parquet(os.path.join(args.out, "ranks")).count()

    n_negatives = None
    if args.negatives:
        negs = graph.negative_samples(triples, k=args.negatives, salt=args.neg_salt)
        negs.write.mode("overwrite").parquet(os.path.join(args.out, "negatives"))
        n_negatives = spark.read.parquet(os.path.join(args.out, "negatives")).count()

    n_path_pairs = None
    if args.path:
        pairs = graph.path_compose(triples, args.path.split(","))
        pairs.write.mode("overwrite").parquet(os.path.join(args.out, "path"))
        n_path_pairs = spark.read.parquet(os.path.join(args.out, "path")).count()

    # dict-sized: one row per predicate
    void_r = spark.read.parquet(os.path.join(args.out, "void"))
    row = void_r.agg(
        F.sum("n_triples").alias("n_triples"), F.count("*").alias("n_preds")
    ).head()
    metrics = {
        "n_triples": row.n_triples,
        "n_predicates": row.n_preds,
        "n_schema_rows": spark.read.parquet(os.path.join(args.out, "schema")).count(),
        "n_ranked": n_ranked,
        "n_path_pairs": n_path_pairs,
        "n_negatives": n_negatives,
        "pagerank_pred": args.pagerank_pred,
        "path": args.path,
    }
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
