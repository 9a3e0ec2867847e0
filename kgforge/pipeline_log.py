"""EP-A/EP-B parity pipeline: raw DBpedia endpoint log -> benchmark tables.

The reference's primary entry point is ``python be4dbp.py -f <access.log>``
([R:be4dbp.py], SURVEY.md 3.1 EP-A): parse combined-log lines, URL-decode
the /sparql?query= parameter, parse + canonicalize each query, dedup
same-client repeats, emit per-date entries and a frequency ranking (EP-B).

This module re-creates that flow Spark-first over ``read_apache_log``:

  read log (gzip-transparent text scan)
    -> JVM field extraction + URL decode              (S1/P3/P4)
    -> same-client duplicate suppression              (W2: lag window)
    -> fused parse+canonicalize pandas stage          (U2+U3, memoized)
    -> per-date partitioned entries table             (S2: partitionBy ds)
    -> BGP frequency ranking                          (A2 / EP-B)
    -> per-date stats                                 (S4 / [R:Stat.py])
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kgforge.sources.logs import read_apache_log

ENTRY_SCHEMA = (
    "ip string, ts timestamp, query string, parse_ok boolean, error string, "
    "query_form string, simple boolean, n_tps int, bgp_hash string, canonical string"
)


def _parse_queries_df(hits: DataFrame) -> DataFrame:
    """Fused U2+U3 over already-extracted query strings (no mention scan —
    the log reader isolated the query parameter)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kgforge.operators.extract import _parse_one

        for pdf in batches:
            res = [_parse_one(q)[:7] for q in pdf["query"].tolist()]
            out = pd.DataFrame(
                res,
                columns=["parse_ok", "error", "query_form", "simple", "n_tps",
                         "bgp_hash", "canonical"],
                index=pdf.index,
            )
            yield pd.concat([pdf[["ip", "ts", "query"]], out], axis=1)

    return hits.select("ip", "ts", "query").mapInPandas(gen, schema=ENTRY_SCHEMA)


def run_log(
    spark: SparkSession,
    log_path: str,
    out_dir: str,
    dedup_same_client: bool = True,
) -> dict:
    """Process one (or a glob of) Apache log file(s); returns metric counts.

    Outputs under ``out_dir``:
      entries/      per-date (ds=YYYY-MM-DD) parsed entries  [S2 routing]
      ranking/      canonical BGP -> frequency               [EP-B]
      stats/        per-date counters (lines/hits/ok/dups)   [R:Stat.py]
    """
    lines = read_apache_log(spark, log_path)
    hits = lines.filter(F.col("query").isNotNull())

    parsed = _parse_queries_df(hits)

    # W2: suppress same-client immediate repeats of the identical query
    if dedup_same_client:
        w = W.partitionBy("ip", F.md5("query")).orderBy("ts")
        parsed = (
            parsed.withColumn("_rn", F.row_number().over(w))
            .withColumn("is_dup", F.col("_rn") > 1)
            .drop("_rn")
        )
    else:
        parsed = parsed.withColumn("is_dup", F.lit(False))

    entries = parsed.withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
    entries.filter(~F.col("is_dup")).drop("is_dup").write.mode("overwrite").partitionBy(
        "ds"
    ).parquet(f"{out_dir}/entries")

    entries_back = spark.read.parquet(f"{out_dir}/entries")
    ranking = (
        entries_back.filter("parse_ok")
        .groupBy("bgp_hash")
        .agg(F.count("*").alias("count"), F.first("canonical").alias("canonical"))
    )
    ranking.write.mode("overwrite").parquet(f"{out_dir}/ranking")

    stats = (
        entries.groupBy("ds")
        .agg(
            F.count("*").alias("hits"),
            F.sum(F.when(F.col("parse_ok") & ~F.col("is_dup"), 1).otherwise(0)).alias("ok"),
            F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("rejected"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("dups"),
        )
    )
    stats.write.mode("overwrite").parquet(f"{out_dir}/stats")

    agg = stats.agg(
        F.sum("hits").alias("hits"), F.sum("ok").alias("ok"),
        F.sum("rejected").alias("rejected"), F.sum("dups").alias("dups"),
    ).collect()[0]
    return {
        "n_lines": lines.count(),
        "n_hits": int(agg["hits"] or 0),
        "n_ok": int(agg["ok"] or 0),
        "n_rejected": int(agg["rejected"] or 0),
        "n_dups": int(agg["dups"] or 0),
        "n_distinct_bgps": ranking.count(),
    }
