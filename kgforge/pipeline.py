"""EP-1 flagship pipeline: source_files -> mentions -> BGPs -> linked triples.

Lifecycle per SURVEY.md 3.2; stage boundaries materialize to the catalog so
runs resume from per-partition checkpoints [B:14] (the reference restarts
from scratch on failure — resume is a new capability the north rule adds).

Plan shape (everything between the two Python stages is JVM/codegen):

  scan -> sha2 (P7) -> pid -> anti-join checkpoints (J5) -> contains (P2)
       -> mapInPandas detect (U1)          [Python, Arrow-batched]
       -> mapInPandas parse+canon (U2+U3)  [Python, Arrow-batched, memoized]
       -> write parsed                      [stage barrier, SURVEY.md 4.3.5]
  read parsed -> explode (U5) -> broadcast-link (U4/J1)
       -> fixture distinct (P/R output)  +  ground groupBy agg (A1)
       -> partitioned salted write (J9)
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.catalog import ParquetCatalog
from kgforge.checkpoint import PID_COL, CheckpointStore, sha_fingerprint_col, with_pid
from kgforge.corpus import entity_dict_rows
from kgforge.operators.extract import (
    detect_mentions_df,
    parse_canonicalize_df,
    prefilter,
    with_content_sha,
)
from kgforge.operators.linking import link_terms
from kgforge.operators.triples import explode_tps, fixture_triples, graph_triples, write_graph


def _count_parquet(spark: SparkSession, path: str) -> int:
    """Row count, 0 when the table is empty-partitioned (no parquet footers to
    infer a schema from — happens on empty input)."""
    try:
        return spark.read.parquet(path).count()
    except Exception:
        return 0


def default_entity_dict(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        entity_dict_rows(), "surface string, entity_id string, prior double, etype string"
    )


def run(
    spark: SparkSession,
    source: DataFrame,
    out_dir: str,
    entity_dict: DataFrame | None = None,
    n_parts: int = 64,
    resume: bool = True,
    run_id: str | None = None,
) -> dict:
    """Run the full pipeline; returns the metrics dict that is also persisted
    to ``stage_metrics``."""
    run_id = run_id or uuid.uuid4().hex[:12]
    cat = ParquetCatalog(out_dir)
    store = CheckpointStore(spark, cat.path("checkpoints"))
    ed = entity_dict if entity_dict is not None else default_entity_dict(spark)
    metrics: dict = {"run_id": run_id}

    # ---- stage 1: extract + parse (Python stages), checkpointed ------------
    t0 = time.time()
    src = with_pid(with_content_sha(source), n_parts)
    pending = store.filter_pending(src, "parsed") if resume else src

    n_in_by_pid = pending.groupBy(PID_COL).agg(
        F.count("*").alias("n_in"), sha_fingerprint_col()
    )

    parsed = parse_canonicalize_df(detect_mentions_df(prefilter(pending)))
    # re-attach pid deterministically (derived from data, SURVEY.md hard part 5)
    parsed = with_pid(parsed, n_parts)
    cat.append_table(parsed, "parsed")

    stats = (
        spark.read.parquet(cat.path("parsed"))
        .groupBy(PID_COL)
        .agg(F.count("*").alias("n_out"))
        .join(n_in_by_pid, PID_COL, "right")  # pids with zero mentions still complete
        .na.fill({"n_out": 0})
    )
    store.mark_done("parsed", stats, int((time.time() - t0) * 1000))
    metrics["stage1_wall_s"] = time.time() - t0

    # ---- stage 2: explode + link + aggregate + write (JVM only) ------------
    t1 = time.time()
    from kgforge.operators.extract import PARSED_SCHEMA

    try:
        parsed_all = spark.read.parquet(cat.path("parsed"))
    except Exception:  # zero mentions ever written -> empty-but-valid run
        parsed_all = spark.createDataFrame([], PARSED_SCHEMA + f", {PID_COL} int")

    rejects = parsed_all.filter(~F.col("parse_ok"))
    cat.write_table(
        rejects.groupBy("kind", "error").agg(F.count("*").alias("n")), "quarantine"
    )

    linked = link_terms(explode_tps(parsed_all), ed)
    fixture = fixture_triples(linked)
    cat.write_table(fixture, "triples_fixture")

    graph = graph_triples(linked)
    write_graph(graph, cat.path("triples"))

    ranking = (
        parsed_all.filter(F.col("parse_ok"))
        .groupBy("bgp_hash")
        .agg(F.count("*").alias("count"), F.first("canonical").alias("canonical"))
        .orderBy(F.desc("count"), F.asc("bgp_hash"))
    )
    cat.write_table(ranking, "bgp_ranking")
    metrics["stage2_wall_s"] = time.time() - t1

    # ---- stage metrics ------------------------------------------------------
    counts = {
        "n_source": source.count(),
        "n_mentions": parsed_all.count(),
        "n_parse_ok": parsed_all.filter("parse_ok").count(),
        "n_fixture_triples": _count_parquet(spark, cat.path("triples_fixture")),
        "n_graph_triples": _count_parquet(spark, cat.path("triples")),
        "n_distinct_bgps": _count_parquet(spark, cat.path("bgp_ranking")),
    }
    metrics.update(counts)
    rows = [(run_id, "pipeline", k, float(v)) for k, v in counts.items()] + [
        (run_id, "pipeline", "stage1_wall_s", metrics["stage1_wall_s"]),
        (run_id, "pipeline", "stage2_wall_s", metrics["stage2_wall_s"]),
    ]
    cat.append_table(
        spark.createDataFrame(rows, "run_id string, stage string, metric string, value double"),
        "stage_metrics",
    )
    return metrics
