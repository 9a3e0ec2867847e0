"""Corpus shard-writer CLI: documents table -> deterministically shuffled
training shards.

    spark-submit --py-files kgforge.zip jobs/shard_corpus.py \
        --docs <documents.parquet> --out <dir> \
        --shards 64 [--seed shuf1]

The last corpus-assembly step: a seeded GLOBAL shuffle
(kgforge.operators.mixing.shuffle_shards — md5 shard pick + within-shard
order, bit-reproducible across re-runs/engines/partitionings) followed by
the sharded write a trainer streams:

    shards/shard=K/   every input column, rows stored in shuffle order
                      (one file per shard: repartition on the shard id +
                      sortWithinPartitions on the order key — the write IS
                      the shuffle, no extra pass)

and prints ONE JSON metrics line (n_docs, n_shards, shard size min/max).
Size --shards so one shard fits a task (the partitioned_write sizing rule);
change --seed to draw an independent epoch order.

Local smoke:

    python jobs/shard_corpus.py --docs /root/testdata/sf0.001/documents.parquet \
        --out /tmp/kg_shards --shards 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kgforge corpus shard writer")
    ap.add_argument("--docs", required=True, help="parquet path: doc_id, ...")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--shards", type=int, default=64, help="number of shards")
    ap.add_argument("--seed", default="shuf1", help="shuffle seed (epoch key)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from kgforge.conf import get_spark

        spark = get_spark("kgforge-shard", master=args.master)

    from kgforge.operators import mixing

    docs = spark.read.parquet(args.docs)
    assign = mixing.shuffle_shards(
        docs, n_shards=args.shards, seed=args.seed, key_col=args.id_col
    )
    # the write IS the shuffle: rows exchange once on the shard id and sort
    # within it on the seeded position — no second pass, no global sort
    sharded = (
        docs.join(assign, args.id_col)
        .repartition(args.shards, "shard")
        .sortWithinPartitions("shard", "pos")
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(args.out, "shards")
    )

    sizes = (
        spark.read.parquet(os.path.join(args.out, "shards"))
        .groupBy("shard")
        .count()
    )
    row = sizes.agg(
        F.count("*").alias("n_shards"),
        F.sum("count").alias("n_docs"),
        F.min("count").alias("min_shard"),
        F.max("count").alias("max_shard"),
    ).head()
    metrics = {
        "n_docs": row.n_docs,
        "n_shards": row.n_shards,
        "min_shard": row.min_shard,
        "max_shard": row.max_shard,
        "seed": args.seed,
    }
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
