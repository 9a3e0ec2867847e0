"""SPARQL query CLI: answer a query over a materialized triple table.

    spark-submit --py-files kgforge.zip jobs/query_graph.py \
        --triples <triples.parquet> \
        (--query 'SELECT ...' | --query-file q.rq) \
        [--out DIR] [--show N] [--closure PRED [--closure-zero]]

The last mile of the KG stack: jobs/build_graph.py materializes the graph,
jobs/graph_stats.py describes it, and this job QUERIES it — the query goes
in as SPARQL text, through the from-scratch parser (kgforge/sparql/
parser.py) and the BGP compiler (kgforge/sparql/eval.py), and runs as a
plain Catalyst join plan (constant positions prune the scan, joins keyed
on shared variables).  Supported (ADVICE r6 low: this paragraph tracks
answer_sparql's round-6 evaluable subset, not the pre-round-6 rejects):
SELECT [DISTINCT] / ASK / CONSTRUCT / DESCRIBE over conjunctive BGPs —
prefixes, 'a', predicate-object/object lists, blank nodes, collections,
single-arm '/' and '^' paths, quantified 'p+'/'p*' (exact closure,
ground endpoints seeded), 'p?' and 'p|q'; top-level OPTIONAL / UNION /
MINUS / VALUES / BIND / FILTER (incl. [NOT] EXISTS); aggregates with
GROUP BY and the ORDER BY / LIMIT / OFFSET modifiers.  Everything the
captured algebra cannot represent exactly (nested OPTIONALs, sub-SELECT,
expression keys, GRAPH/SERVICE, ...) stays a clean NotImplementedError
reject (exit 2), never a silently-wrong answer; the --closure mode
remains for driving graph.path_closure directly.

Results go to --out as parquet (one column per projected variable) and/or
print with --show N; one JSON metrics line goes to stdout either way.

Local smoke:

    python jobs/build_graph.py --corpus-rows 400 --out /tmp/kg_g
    python jobs/query_graph.py --triples /tmp/kg_g/triples \
        --query 'SELECT ?s ?o WHERE { ?s <P31> ?o }' --show 5
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kgforge SPARQL query runner")
    ap.add_argument("--triples", required=True, help="graph table: subj, pred, obj")
    ap.add_argument(
        "--triples-format",
        choices=("parquet", "ntriples"),
        default="parquet",
        help="input format; 'ntriples' parses RDF interchange text "
        "(sources/ntriples.py) and quarantines malformed lines with a "
        "counted warning instead of failing",
    )
    ap.add_argument(
        "--strip-base",
        default="",
        help="IRI prefix to strip when reading ntriples input",
    )
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--query", help="SPARQL query text")
    g.add_argument("--query-file", help="file holding the SPARQL query")
    g.add_argument(
        "--closure",
        metavar="PRED",
        help="transitive closure of one predicate ('^' prefix = inverse): "
        "exact 'PRED+' semantics, '--closure-zero' for 'PRED*'",
    )
    ap.add_argument("--closure-zero", action="store_true")
    ap.add_argument("--out", default=None, help="write the result here")
    ap.add_argument(
        "--format",
        choices=("parquet", "ntriples"),
        default="parquet",
        help="output format; 'ntriples' requires a triple-shaped result "
        "(CONSTRUCT / --closure) and serializes it as RDF interchange "
        "text (sources/ntriples.py)",
    )
    ap.add_argument(
        "--base-iri",
        default="",
        help="IRI prefix for --format ntriples (plain ids become absolute IRIs)",
    )
    ap.add_argument("--show", type=int, default=0, metavar="N", help="print N rows")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if args.out is None and not args.show:
        ap.error("need --out and/or --show")

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from kgforge.conf import get_spark

        spark = get_spark("kgforge-query", master=args.master)

    if args.triples_format == "ntriples":
        from pyspark.sql import functions as F

        from kgforge.sources.ntriples import read_ntriples

        raw = read_ntriples(spark, args.triples, strip_base=args.strip_base)
        n_bad = raw.filter(~F.col("parse_ok")).count()
        if n_bad:
            print(json.dumps({"warn_malformed_lines": n_bad}), file=sys.stderr)
        triples = raw.filter(F.col("parse_ok")).select("subj", "pred", "obj")
    else:
        triples = spark.read.parquet(args.triples)

    if args.closure:
        from kgforge.operators.graph import path_closure

        result = path_closure(triples, args.closure, include_zero=args.closure_zero)
        qtext = None
    else:
        from kgforge.sparql.eval import answer_sparql

        qtext = args.query
        if args.query_file:
            with open(args.query_file, "r", encoding="utf-8") as fh:
                qtext = fh.read()
        try:
            result = answer_sparql(triples, qtext)
        except (ValueError, NotImplementedError) as e:
            # parse rejects and out-of-subset queries are OPERATOR errors,
            # not stack traces: one diagnostic line, exit 2 (the reference's
            # skip-and-count analog for a single-query surface)
            print(json.dumps({"error": str(e)}), file=sys.stderr)
            return 2

    if args.out:
        if args.format == "ntriples":
            if set(result.columns) != {"subj", "pred", "obj"}:
                print(
                    json.dumps({"error": "ntriples output needs a (subj, pred, obj) result"}),
                    file=sys.stderr,
                )
                return 2
            from kgforge.sources.ntriples import read_ntriples, write_ntriples

            write_ntriples(result, args.out, base_iri=args.base_iri)
            result = read_ntriples(spark, args.out, strip_base=args.base_iri).select(
                "subj", "pred", "obj"
            )  # count the committed data
        else:
            result.write.mode("overwrite").parquet(args.out)
            result = spark.read.parquet(args.out)  # count the committed data
    n = result.count()
    if args.show:
        for row in result.limit(args.show).collect():
            print(json.dumps(row.asDict(), default=str))
    metrics = {
        "n_rows": n,
        "columns": result.columns,
        "out": args.out,
        "closure": args.closure,
    }
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
