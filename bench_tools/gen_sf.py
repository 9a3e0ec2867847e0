"""Deterministic local upsampler: /root/testdata/sf0.1 -> sf<mult/10> dir.

The driver's round-end measurement runs at an escalated, driver-generated
scale (BENCH_r06.json "sf": 1.0); that data does not ship with the sandbox,
so in-session scale measurements need a local stand-in.  This builds one by
unioning `mult` key-shifted copies of the deterministic sf0.1 tables:

  * fact/dim keys shift by copy_index * (table's sf0.1 key range) so all
    FK joins land exactly as in the source copy — join fan-outs, group
    sizes and selectivities are preserved, row counts scale linearly
    (mult=10 reproduces the driver's sf1.0 row counts: 6M lineitem,
    50k documents);
  * nation/region stay single-copy (TPC-H dimension semantics);
  * document text gets a per-copy vocabulary suffix on every word so
    copies are NOT near-duplicates of each other (minhash/LSH/substring
    dedup workloads would otherwise explode with cross-copy pairs the
    real generator does not produce); n_chars is recomputed;
  * embeddings rotate component order per copy (norm-preserving
    decorrelation, avoids cross-copy exact-dup vectors);
  * events shift (event_id, user_id) per copy, keeping per-user series
    identical to the source copy.

Purely for relative A/B measurement; never used by bench.py defaults,
tests, or any declared query.  Usage:

    python bench_tools/gen_sf.py [mult] [out_dir]
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

# per-table key shift units = sf0.1 key range (row count of the owning table)
SHIFT = {"custkey": 15_000, "orderkey": 150_000, "suppkey": 1_000,
         "partkey": 20_000, "doc_id": 5_000, "vec_id": 2_000,
         "event_id": 100_000, "user_id": 1_000_000}


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/sf_local/sf{mult / 10:g}"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName(f"gen_sf_x{mult}")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    os.makedirs(out, exist_ok=True)

    def shifted(df, cols, i):
        for c in cols:
            unit = next(u for k, u in SHIFT.items() if c.endswith(k))
            df = df.withColumn(c, (F.col(c) + F.lit(i * unit)).cast("long"))
        return df

    def write(name, copy_fn):
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = [copy_fn(src, i) for i in range(mult)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")

    write("customer", lambda d, i: shifted(d, ["c_custkey"], i))
    write("supplier", lambda d, i: shifted(d, ["s_suppkey"], i))
    write("part", lambda d, i: shifted(d, ["p_partkey"], i))
    write("orders", lambda d, i: shifted(d, ["o_orderkey", "o_custkey"], i))
    write("lineitem",
          lambda d, i: shifted(d, ["l_orderkey", "l_partkey", "l_suppkey"], i))
    write("events", lambda d, i: shifted(d, ["event_id", "user_id"], i))

    def doc_copy(d, i):
        d = shifted(d, ["doc_id"], i)
        if i == 0:
            return d
        tagged = F.concat_ws(
            " ",
            F.transform(F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(str(i)))),
        )
        return d.withColumn("text", tagged).withColumn(
            "n_chars", F.length("text").cast("long")
        )

    write("documents", doc_copy)

    def emb_copy(d, i):
        d = shifted(d, ["vec_id"], i)
        if i == 0:
            return d
        n = F.size("embedding")
        rot = F.concat(
            F.slice(F.col("embedding"), F.lit(i + 1), n - F.lit(i)),
            F.slice(F.col("embedding"), 1, i),
        )
        return d.withColumn("embedding", rot)

    write("embeddings", emb_copy)

    for small in ("nation", "region"):
        src_p, dst_p = f"{SRC}/{small}.parquet", f"{out}/{small}.parquet"
        shutil.rmtree(dst_p, ignore_errors=True)
        if os.path.isdir(src_p):
            shutil.copytree(src_p, dst_p)
        else:
            shutil.copy(src_p, dst_p)
    with open(os.path.join(out, "_DONE"), "w") as fh:
        fh.write("local upsample of sf0.1, gen_sf.py\n")
    spark.stop()
    print("wrote", out)


if __name__ == "__main__":
    main()
