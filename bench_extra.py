"""Per-query isolation harness for optimization work (guide section 1.4).

NOT the driver contract — bench.py stays frozen for measurement.  This
tool times ONE registry query (or a list) with the noop sink, optionally
captures .explain("formatted") to plans/r07/, and labels jobs so the UI /
event logs are readable.

Usage:
    python bench_extra.py <query> [<query> ...] [--reps N] [--explain TAG]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
With --explain TAG, writes plans/r07/<query>_<TAG>.txt before timing.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from kgforge.conf import get_spark
    from kgforge.queries import REGISTRY

    spark = get_spark("kgforge-bench-extra", master=f"local[{cpus}]")
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict = {}
    for name in args.queries:
        fn, _ = REGISTRY[name]
        if args.explain:
            os.makedirs("plans/r07", exist_ok=True)
            df = fn(spark, sf_dir)
            with open(f"plans/r07/{name}_{args.explain}.txt", "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        walls = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"median": round(statistics.median(walls), 3), "samples": walls}
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
