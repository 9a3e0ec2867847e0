"""Training-data dedup CLI: documents table -> cluster assignments + keep set.

    spark-submit --py-files kgforge.zip jobs/dedup_corpus.py \
        --docs <documents.parquet> --out <dir> \
        [--method minhash|simhash|exact] [--threshold 0.5] [--max-hamming 3] \
        [--state <dir>] [--remove <ids> [--no-split]] [--compact]

Writes to <out>:
    clusters/   (doc_id, cluster_id, is_canonical)  — full assignment
    keep/       the canonical documents only (the deduped corpus)
and prints ONE JSON metrics line (n_docs, n_clusters, n_dropped, dup_rate).

With ``--state`` (minhash only), --docs is a NEW BATCH joining a growing
corpus: candidates come from one equi-join of the batch's band signatures
against the persisted state, and the cluster assignment updates from
compressed star edges — per-batch cost O(batch + candidates), never
O(corpus) (the dedup analogue of the incremental graph MERGE).

Local smoke:

    python jobs/dedup_corpus.py --docs /root/testdata/sf0.001/documents.parquet \
        --out /tmp/kg_dedup
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kgforge corpus deduplication")
    ap.add_argument("--docs", help="parquet path: doc_id, text, ...")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument(
        "--method",
        choices=("minhash", "simhash", "exact", "embed"),
        default="minhash",
        help="near-dup pair generator feeding the connected-components step",
    )
    ap.add_argument(
        "--threshold",
        type=float,
        default=None,
        help="similarity gate: Jaccard for --method minhash (default 0.5), "
        "cosine for --method embed (default 0.8); honored as given "
        "(ADVICE r3: no silent clamping)",
    )
    ap.add_argument("--max-hamming", type=int, default=3, help="bit distance gate (simhash)")
    ap.add_argument(
        "--embeddings",
        help="parquet (vec_id, embedding) aligned with doc_id — required for --method embed",
    )
    ap.add_argument(
        "--state",
        help="incremental mode (minhash/simhash/embed): persistent state directory "
        "holding bands/ (LSH band signatures of every prior doc), corpus/ "
        "(accumulated documents), assign/ (current cluster assignment).  "
        "Each invocation treats --docs as a NEW BATCH: candidates come from "
        "one equi-join of the batch's bands against the state, old text is "
        "read only for candidate docs, and clusters update from compressed "
        "star edges — per-batch cost is O(batch + candidates), not O(corpus).",
    )
    ap.add_argument(
        "--remove",
        help="tombstone file for --state mode: doc ids to delete from the "
        "corpus (parquet first column, or a text file with one id per "
        "line).  Appends to the state's tombstones/ set, re-elects or "
        "splits affected clusters, and refreshes assign/, clusters/ and "
        "keep/ — no --docs batch in the same invocation.",
    )
    ap.add_argument(
        "--no-split",
        action="store_true",
        help="with --remove: skip the pair-history component split and only "
        "relabel/re-elect (clusters losing a bridge doc stay merged)",
    )
    ap.add_argument(
        "--compact",
        action="store_true",
        help="with --state: physically rewrite the state tables without "
        "tombstoned rows and clear the tombstone set (reclaims storage and "
        "retires the per-batch anti-join); runs alone, no --docs/--remove",
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

        spark = get_spark("kgforge-dedup", master=args.master)

    from kgforge.operators import dedup

    if args.compact:
        if not args.state:
            ap.error("--compact requires --state")
        if args.docs or args.remove:
            ap.error("--compact runs alone (no --docs / --remove)")
        m = dedup.compact_dedup_state(spark, args.state)
        print(json.dumps(m))
        return 0
    if args.remove:
        if not args.state:
            ap.error("--remove requires --state (tombstones apply to a persistent state)")
        if args.docs:
            ap.error("--remove and --docs are separate invocations (remove first)")
        return _run_remove(spark, args)
    if not args.docs:
        ap.error("--docs is required (except with --remove)")
    docs = spark.read.parquet(args.docs)
    if args.state:
        if args.method not in ("minhash", "simhash", "embed"):
            ap.error("--state (incremental mode) supports --method minhash|simhash|embed")
        if args.method == "embed" and not args.embeddings:
            ap.error("--method embed requires --embeddings")
        return _run_incremental(spark, docs, args)
    if args.method == "minhash":
        thr = 0.5 if args.threshold is None else args.threshold
        # pairs=None takes dedup_clusters' default path: exact-content rep
        # collapse + minhash over distinct contents (round 5) — same
        # clusters, several-fold cheaper at real dup rates, and immune to
        # the hot-shingle-guard escape for heavy families
        clusters = dedup.dedup_clusters(docs, threshold=thr)
        pairs = None
    elif args.method == "simhash":
        pairs = dedup.simhash_near_pairs(docs, max_hamming=args.max_hamming)
    elif args.method == "embed":
        if not args.embeddings:
            ap.error("--method embed requires --embeddings")
        from kgforge.operators import similarity

        emb = spark.read.parquet(args.embeddings)
        thr = 0.8 if args.threshold is None else args.threshold
        if thr < 0.5:
            print(
                f"warning: cosine threshold {thr} is permissive; the LSH band "
                "recall is tuned for near-duplicates (>= ~0.8)",
                file=sys.stderr,
            )
        pairs = similarity.lsh_near_pairs(emb, threshold=thr)
    else:  # exact: same-content star edges (min-id hub per md5)
        pairs = dedup.exact_pairs(docs)

    if pairs is not None:
        clusters = dedup.dedup_clusters(docs, pairs=pairs)
    clusters.write.mode("overwrite").parquet(os.path.join(args.out, "clusters"))
    clusters_r = spark.read.parquet(os.path.join(args.out, "clusters"))

    # deduped corpus: canonical docs only (broadcast the dict-sized drop set
    # is wrong at scale — semi-join the assignment instead)
    keep = docs.join(
        clusters_r.filter(F.col("is_canonical")).select("doc_id"), "doc_id", "left_semi"
    )
    keep.write.mode("overwrite").parquet(os.path.join(args.out, "keep"))

    n_docs = docs.count()
    n_keep = spark.read.parquet(os.path.join(args.out, "keep")).count()
    n_clusters = clusters_r.select("cluster_id").distinct().count()
    metrics = {
        "method": args.method,
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "n_kept": n_keep,
        "n_dropped": n_docs - n_keep,
        "dup_rate": round((n_docs - n_keep) / max(n_docs, 1), 4),
    }
    print(json.dumps(metrics))
    return 0


def _run_incremental(spark, new_docs, args) -> int:
    """One incremental batch: apply to state (dedup.incremental_dedup_update),
    emit the refreshed assignment + keep set and one JSON metrics line."""
    from pyspark.sql import functions as F

    from kgforge.operators import dedup

    default_thr = 0.8 if args.method == "embed" else 0.5
    thr = default_thr if args.threshold is None else args.threshold
    n_batch = new_docs.count()
    emb = None
    if args.method == "embed":
        # the embeddings table is keyed vec_id (aligned with doc_id); the
        # incremental path needs exactly the BATCH's vectors under doc_id
        emb = (
            spark.read.parquet(args.embeddings)
            .withColumnRenamed("vec_id", "doc_id")
            .join(new_docs.select("doc_id"), "doc_id", "left_semi")
        )
    assign_r = dedup.incremental_dedup_update(
        spark, new_docs, args.state, thr,
        method=args.method, max_hamming=args.max_hamming, embeddings=emb,
    )
    all_docs = spark.read.parquet(os.path.join(args.state, "corpus"))
    tomb_p = os.path.join(args.state, "tombstones")
    if os.path.exists(tomb_p):
        tombs = spark.read.parquet(tomb_p).select("doc_id").distinct()
        all_docs = all_docs.join(tombs, "doc_id", "left_anti")

    assign_r.write.mode("overwrite").parquet(os.path.join(args.out, "clusters"))
    keep = all_docs.join(
        assign_r.filter(F.col("is_canonical")).select("doc_id"), "doc_id", "left_semi"
    )
    keep.write.mode("overwrite").parquet(os.path.join(args.out, "keep"))

    n_docs = all_docs.count()
    n_keep = spark.read.parquet(os.path.join(args.out, "keep")).count()
    metrics = {
        "method": args.method,
        "incremental": True,
        "n_batch": n_batch,
        "n_docs": n_docs,
        "n_clusters": assign_r.select("cluster_id").distinct().count(),
        "n_kept": n_keep,
        "n_dropped": n_docs - n_keep,
        "dup_rate": round((n_docs - n_keep) / max(n_docs, 1), 4),
    }
    print(json.dumps(metrics))
    return 0


def _run_remove(spark, args) -> int:
    """Tombstone application: append ids, re-elect/split clusters, refresh
    the clusters/ + keep/ outputs from the surviving corpus."""
    from pyspark.sql import functions as F

    from kgforge.operators import dedup

    if args.remove.endswith(".parquet") or os.path.isdir(args.remove):
        removed = spark.read.parquet(args.remove)
    else:
        removed = spark.read.text(args.remove).select(
            F.trim("value").cast("long").alias("doc_id")
        ).filter(F.col("doc_id").isNotNull())
    n_removed = removed.count()
    assign_r = dedup.incremental_dedup_remove(
        spark, removed, args.state, split=not args.no_split
    )
    tombs = spark.read.parquet(os.path.join(args.state, "tombstones")).select("doc_id").distinct()
    all_docs = spark.read.parquet(os.path.join(args.state, "corpus")).join(
        tombs, "doc_id", "left_anti"
    )
    assign_r.write.mode("overwrite").parquet(os.path.join(args.out, "clusters"))
    keep = all_docs.join(
        assign_r.filter(F.col("is_canonical")).select("doc_id"), "doc_id", "left_semi"
    )
    keep.write.mode("overwrite").parquet(os.path.join(args.out, "keep"))

    n_docs = all_docs.count()
    n_keep = spark.read.parquet(os.path.join(args.out, "keep")).count()
    # meta through the fsio seam (ADVICE r5: builtin open() silently pinned
    # the marker to the local filesystem); "split" reports what actually ran
    # — the format gate downgrades to conservative merge on upgraded states
    from kgforge import fsio

    fs = fsio.get_fs(args.state)
    meta = dedup.read_state_meta(fs, args.state)
    state_method = meta.get("method", "minhash")
    split_effective = (
        not args.no_split
        and fs.exists(os.path.join(args.state, "pairs"))
        and meta.get("format", 1) >= dedup.STATE_FORMAT
    )
    metrics = {
        "method": state_method,
        "removed": n_removed,
        "split": split_effective,
        "n_docs": n_docs,
        "n_clusters": assign_r.select("cluster_id").distinct().count(),
        "n_kept": n_keep,
        "n_dropped": n_docs - n_keep,
        "dup_rate": round((n_docs - n_keep) / max(n_docs, 1), 4),
    }
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
