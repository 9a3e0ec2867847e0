"""Ablation of negative_samples stages at a given sf_dir (guide §1.4)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kgforge.conf import get_spark
from kgforge.queries import _dm_triples


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sf_local/sf1.0"
spark = get_spark("negs-decompose", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS','32')}]")
spark.range(1000).selectExpr("sum(id)").collect()
t = {}

triples = _dm_triples(spark, sf_dir)
k, salt = 2, "neg1"

t0 = time.time()
ents = (
    triples.select(F.col("subj").alias("e"))
    .union(triples.select(F.col("obj").alias("e")))
    .distinct()
    .localCheckpoint(eager=True)
)
t["1_ents_distinct_ckpt"] = round(time.time() - t0, 2)

t0 = time.time()
parts = max(spark.sparkContext.defaultParallelism, 1)
ranged = ents.repartitionByRange(parts, "e").withColumn(
    "_pid", F.spark_partition_id()
).localCheckpoint(eager=True)
sizes = {r._pid: r.c for r in ranged.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
offsets, acc = {}, 0
for pid in sorted(sizes):
    offsets[pid] = acc
    acc += sizes[pid]
t["2_range_offsets"] = round(time.time() - t0, 2)
t["n_ents"] = acc

off_expr = F.coalesce(
    F.element_at(
        F.create_map(*[x for p, o in offsets.items() for x in (F.lit(p), F.lit(o))]),
        F.col("_pid"),
    ),
    F.lit(0),
)
idx = ranged.select(
    "e", (F.row_number().over(W.partitionBy("_pid").orderBy("e")) - 1 + off_expr).alias("i")
)
n = acc

drawn = triples.select("subj", "pred", "obj").withColumn(
    "neg_i", F.explode(F.array(*[F.lit(i) for i in range(1, k + 1)]))
)
pick = (
    F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("subj"), F.col("pred"), F.col("obj"),
                              F.lit(salt), F.col("neg_i").cast("string"))),
            1, 8,
        ), 16, 10,
    ).cast("long") % n
)
cand = (
    drawn.withColumn("i", pick)
    .join(F.broadcast(idx), "i")
    .withColumn("neg_obj", F.col("e"))
    .drop("i", "e")
    .filter(F.col("neg_obj") != F.col("obj"))
)
t["3_cand_no_anti"] = noop(cand)

truths = triples.select("subj", "pred", F.col("obj").alias("neg_obj"))
t["4_full_with_anti"] = noop(cand.join(truths, ["subj", "pred", "neg_obj"], "left_anti"))
print(json.dumps(t))
spark.stop()
