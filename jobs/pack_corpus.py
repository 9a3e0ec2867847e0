"""Corpus sequence-packing CLI: documents table -> pack assignment + manifest.

    spark-submit --py-files kgforge.zip jobs/pack_corpus.py \
        --docs <documents.parquet> --out <dir> \
        [--budget 2048] [--bins N] [--no-chunk]

Composes the corpus-assembly operators (kgforge.operators.packing): by
default every document is first CHUNKED to the token budget
(chunk_documents — truncation-free, so no oversize singletons can exist),
then the chunks are packed into fixed-budget training sequences
(pack_documents, bucketed best-fit-decreasing).  Writes to <out>:

    packs/     (doc_id, chunk_id, unit_id, n_tokens, pack_id, pack_tokens)
               — one row per packed unit, joinable back to the corpus
    manifest/  (pack_id, n_units, pack_tokens, fill) — one row per pack

and prints ONE JSON metrics line (n_docs, n_units, n_packs, fill_mean,
n_oversize).  With --no-chunk, documents pack whole and oversize ones are
flagged singleton packs instead of being split.

Unit ids for chunked packing are (doc_id << 20) | chunk_id — stable and
collision-free while doc_id < 2^43 and a document has < 2^20 chunks (a
2^20-chunk doc at budget 2048 is ~2 G tokens; the CLI refuses beyond it).

Local smoke:

    python jobs/pack_corpus.py --docs /root/testdata/sf0.001/documents.parquet \
        --out /tmp/kg_pack
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_CHUNKS = 1 << 20


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kgforge corpus sequence packing")
    ap.add_argument("--docs", required=True, help="parquet path: doc_id, text, ...")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--budget", type=int, default=2048, help="tokens per pack")
    ap.add_argument(
        "--bins",
        type=int,
        default=None,
        help="independent packing buckets (default 4x parallelism); more bins "
        "= more parallelism, slightly looser packing",
    )
    ap.add_argument(
        "--no-chunk",
        action="store_true",
        help="pack whole documents; docs over the budget become flagged "
        "oversize singleton packs instead of being split",
    )
    ap.add_argument(
        "--tokenizer",
        choices=("ws", "regex", "bpe"),
        default="ws",
        help="budget unit: 'ws' whitespace tokens, 'regex' BPE-ish tokens "
        "(words/numbers/single symbols — approximates subword budgets on "
        "punctuation-dense text), or 'bpe' (train a real BPE model on the "
        "corpus, save its merges under <out>/bpe_merges, and budget on "
        "exact subword counts — chunk boundaries then fall on token-"
        "sequence positions, as post-tokenization sequence prep does); "
        "applies to chunking AND packing so the no-oversize composition "
        "invariant holds under every counter",
    )
    ap.add_argument(
        "--bpe-merges",
        type=int,
        default=2000,
        help="merge budget when --tokenizer bpe (training stops early once "
        "no pair reaches --bpe-min-count)",
    )
    ap.add_argument(
        "--bpe-min-count",
        type=int,
        default=2,
        help="minimum pair frequency a BPE merge must reach",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from kgforge.conf import get_spark

        spark = get_spark("kgforge-pack", master=args.master)

    from kgforge.operators import packing

    docs = spark.read.parquet(args.docs)
    n_docs = docs.count()

    if args.tokenizer == "bpe":
        # train once (histogram shuffle + driver-side merges), persist the
        # merges beside the output so the encode is reproducible, then
        # budget on EXACT subword counts end to end.
        from kgforge.operators import tokenizer as tk

        model = tk.train_bpe(
            docs, n_merges=args.bpe_merges, min_count=args.bpe_min_count
        )
        model.to_df(spark).write.mode("overwrite").parquet(
            os.path.join(args.out, "bpe_merges")
        )
        enc = tk.encode_bpe(docs, model)
        if args.no_chunk:
            units = enc.select(
                "doc_id",
                F.lit(0).alias("chunk_id"),
                F.col("doc_id").alias("unit_id"),
                "n_tokens",
            )
        else:
            ch = tk.chunk_encoded(enc, args.budget)
            over = ch.filter(F.col("chunk_id") >= MAX_CHUNKS).limit(1).count()
            if over:
                ap.error(f"a document exceeds {MAX_CHUNKS} chunks; raise --budget")
            units = ch.select(
                "doc_id",
                "chunk_id",
                (F.shiftleft(F.col("doc_id"), 20) + F.col("chunk_id")).alias(
                    "unit_id"
                ),
                "n_tokens",
            )
        packed = packing.pack_documents(
            units.select(F.col("unit_id").alias("doc_id"), "n_tokens"),
            budget_tokens=args.budget,
            n_bins=args.bins,
            token_col="n_tokens",
        ).select(
            F.col("doc_id").alias("unit_id"),
            "n_tokens",
            "pack_id",
            "pack_tokens",
            "oversize",
        )
        return _finish(spark, args, ap, n_docs, units, packed)

    if args.no_chunk:
        units = docs.select("doc_id", "text").withColumn(
            "chunk_id", F.lit(0)
        ).withColumn("unit_id", F.col("doc_id"))
    else:
        chunks = packing.chunk_documents(
            docs, budget_tokens=args.budget, tokenizer=args.tokenizer
        )
        over = chunks.filter(F.col("chunk_id") >= MAX_CHUNKS).limit(1).count()
        if over:
            ap.error(f"a document exceeds {MAX_CHUNKS} chunks; raise --budget")
        units = chunks.select(
            "doc_id",
            "chunk_id",
            (F.shiftleft(F.col("doc_id"), 20) + F.col("chunk_id")).alias("unit_id"),
            F.col("chunk_text").alias("text"),
        )

    packed = packing.pack_documents(
        units.select(F.col("unit_id").alias("doc_id"), "text"),
        budget_tokens=args.budget,
        n_bins=args.bins,
        tokenizer=args.tokenizer,
    ).select(
        F.col("doc_id").alias("unit_id"),
        "n_tokens",
        "pack_id",
        "pack_tokens",
        "oversize",
    )
    return _finish(spark, args, ap, n_docs, units, packed)


def _finish(spark, args, ap, n_docs, units, packed) -> int:
    from pyspark.sql import functions as F

    out_rows = units.select("doc_id", "chunk_id", "unit_id").join(
        packed, "unit_id"
    )
    out_rows.write.mode("overwrite").parquet(os.path.join(args.out, "packs"))
    out_r = spark.read.parquet(os.path.join(args.out, "packs"))

    manifest = out_r.groupBy("pack_id").agg(
        F.count("*").alias("n_units"),
        F.first("pack_tokens").alias("pack_tokens"),
        F.round(F.first("pack_tokens") / args.budget, 4).alias("fill"),
    )
    manifest.write.mode("overwrite").parquet(os.path.join(args.out, "manifest"))
    man_r = spark.read.parquet(os.path.join(args.out, "manifest"))

    row = man_r.agg(
        F.count("*").alias("n_packs"), F.round(F.avg("fill"), 4).alias("fill_mean")
    ).head()
    metrics = {
        "n_docs": n_docs,
        "n_units": out_r.count(),
        "n_packs": row.n_packs,
        "budget": args.budget,
        "fill_mean": row.fill_mean,
        "n_oversize": out_r.filter("oversize").count(),
        "chunked": not args.no_chunk,
        "tokenizer": args.tokenizer,
    }
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
