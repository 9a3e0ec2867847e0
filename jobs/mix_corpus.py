"""Corpus mixing CLI: documents table -> deterministically re-weighted corpus.

    spark-submit --py-files kgforge.zip jobs/mix_corpus.py \
        --docs <documents.parquet> --out <dir> \
        --rates en=0.25,fr=2.5 [--default-rate 1.0] [--group-col lang] \
        [--salt mix1]

Applies the content-keyed domain mixture (kgforge.operators.mixing): each
group's rate downsamples (< 1) or upsamples by repetition (> 1); unlisted
groups keep ``--default-rate``.  Writes to <out>:

    mixed/    the materialized mixture — every input column plus a 0-based
              ``copy`` ordinal and the decision's ``mix_bucket``

and prints ONE JSON metrics line (n_docs, n_out, realized per-group rates).
The whole pass is one narrow projection + explode — no shuffle; only the
dict-sized per-group realized-rate rollup aggregates.

Local smoke:

    python jobs/mix_corpus.py --docs /root/testdata/sf0.001/documents.parquet \
        --out /tmp/kg_mix --rates en=0.5,fr=2.0
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_rates(s: str) -> dict:
    out = {}
    for part in s.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"rate {part!r} is not group=rate")
        g, r = part.split("=", 1)
        out[g.strip()] = float(r)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kgforge corpus domain mixing")
    ap.add_argument("--docs", required=True, help="parquet path: doc_id, <group-col>, ...")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument(
        "--rates",
        required=True,
        help="comma-separated group=rate pairs (rate < 1 downsamples, > 1 "
        "upsamples by repetition; micro-unit precision), e.g. en=0.25,fr=2.5",
    )
    ap.add_argument("--default-rate", type=float, default=1.0,
                    help="rate for groups not listed in --rates")
    ap.add_argument("--group-col", default="lang", help="domain column")
    ap.add_argument("--salt", default="mix1",
                    help="decision salt; different salts draw independent mixtures")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    try:
        rates = _parse_rates(args.rates)
    except ValueError as e:
        ap.error(str(e))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from kgforge.conf import get_spark

        spark = get_spark("kgforge-mix", master=args.master)

    from kgforge.operators import mixing

    docs = spark.read.parquet(args.docs)
    mixed = mixing.materialize_mixture(
        docs, rates, group_col=args.group_col, salt=args.salt,
        default_rate=args.default_rate,
    )
    mixed.write.mode("overwrite").parquet(os.path.join(args.out, "mixed"))
    mixed_r = spark.read.parquet(os.path.join(args.out, "mixed"))

    # dict-sized rollup: realized rate per group (out rows / in rows)
    in_counts = {r[0]: r[1] for r in docs.groupBy(args.group_col).count().collect()}
    out_counts = {r[0]: r[1] for r in mixed_r.groupBy(args.group_col).count().collect()}
    realized = {
        g: round(out_counts.get(g, 0) / n, 4) for g, n in sorted(in_counts.items())
    }
    n_docs = sum(in_counts.values())
    n_out = sum(out_counts.values())
    metrics = {
        "n_docs": n_docs,
        "n_out": n_out,
        "rates": rates,
        "default_rate": args.default_rate,
        "realized_rates": realized,
        "salt": args.salt,
    }
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
