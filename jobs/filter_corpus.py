"""Training-data quality filter CLI: documents table -> kept corpus + audit.

    spark-submit --py-files kgforge.zip jobs/filter_corpus.py \
        --docs <documents.parquet> --out <dir> \
        [--min-logprob -9.0 | --drop-logprob-pct 5] [--lang en,fr] [--no-rules] \
        [--max-dup-line-frac 0.3] [--max-dup-2gram-frac 0.2] [--audit-lm] \
        [--decontaminate <eval.parquet> --decontam-n 8] [--redact-pii] \
        [--dsir-target <target.parquet> [--min-dsir X | --keep-dsir-pct P]] \
        [--dedup-paragraphs [--para-delim REGEX]] \
        [--strip-dup-substrings K [--substring-state DIR]]

Composes the text-quality operators into the filter pass a pretraining
corpus ships: Gopher-style hard rules (kgforge.operators.text.quality_rules)
AND an optional corpus-self-scored unigram-LM log-probability floor
(text.unigram_logprob) AND an optional language allowlist (text.langid).
Writes to <out>:

    keep/     documents passing every enabled filter
    audit/    (doc_id, per-rule booleans, avg_logprob, pred_lang, keep)
              — the full decision record, one row per input document;
              pred_lang is recorded only when --lang enables the language
              filter (null otherwise — the per-row marker scans are real
              CPU, and rules-only runs stay one exchange-free corpus scan)
and prints ONE JSON metrics line (n_docs, n_kept, drop breakdown per
filter).  All filters are JVM-side DataFrame ops; the only driver-side
values are the dict-sized metric counts.

Local smoke:

    python jobs/filter_corpus.py --docs /root/testdata/sf0.001/documents.parquet \
        --out /tmp/kg_filter
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kgforge corpus quality filter")
    ap.add_argument("--docs", required=True, help="parquet path: doc_id, text, ...")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument(
        "--min-logprob",
        type=float,
        default=None,
        help="drop documents whose corpus-unigram avg log-probability is "
        "below this floor (e.g. -9.0); omit to disable the LM filter",
    )
    ap.add_argument(
        "--drop-logprob-pct",
        type=float,
        default=None,
        help="drop the WORST-scoring P percent of documents by corpus-unigram "
        "avg log-probability (floor = approx P-th percentile, one "
        "percentile_approx aggregate — the relative form of --min-logprob "
        "a corpus-scale pass actually uses); mutually exclusive with "
        "--min-logprob",
    )
    ap.add_argument(
        "--lang",
        default=None,
        help="comma-separated language allowlist (langid marker heuristic); "
        "omit to disable the language filter",
    )
    ap.add_argument(
        "--no-rules", action="store_true", help="disable the Gopher-style hard rules"
    )
    ap.add_argument(
        "--max-dup-line-frac",
        type=float,
        default=None,
        help="drop documents whose duplicate-line fraction exceeds this "
        "(Gopher-style within-document repetition filter); omit to skip "
        "the repetition passes entirely",
    )
    ap.add_argument(
        "--max-dup-2gram-frac",
        type=float,
        default=None,
        help="drop documents whose duplicate word-2-gram char-mass fraction "
        "exceeds this; omit to skip the repetition passes entirely",
    )
    ap.add_argument(
        "--audit-lm",
        action="store_true",
        help="record avg_logprob in the audit even when no LM floor is "
        "enabled (costs the two unigram-LM corpus passes; without this "
        "flag a rules-only run is a single corpus scan and the audit's "
        "avg_logprob column is null)",
    )
    ap.add_argument(
        "--decontaminate",
        default=None,
        metavar="EVAL_PARQUET",
        help="drop documents sharing a word n-gram with this evaluation set "
        "(benchmark decontamination; the eval gram hashes broadcast, so the "
        "check adds no corpus shuffle); the parquet needs a text column",
    )
    ap.add_argument(
        "--decontam-n",
        type=int,
        default=8,
        help="n-gram length for --decontaminate (published pipelines use "
        "8..13; default 8)",
    )
    ap.add_argument(
        "--min-bigram-logprob",
        type=float,
        default=None,
        help="drop documents whose corpus-bigram (Jelinek-Mercer) avg "
        "log-probability is below this floor — the transition-plausibility "
        "rung above --min-logprob (word salad passes unigram, fails this); "
        "omit to skip the bigram-LM passes entirely",
    )
    ap.add_argument(
        "--dsir-target",
        default=None,
        metavar="TARGET_PARQUET",
        help="score every document's DSIR log importance ratio against this "
        "quality-target corpus (hashed-bigram feature models; Xie et al. "
        "2023) — enables --min-dsir / --keep-dsir-pct; the parquet needs a "
        "text column",
    )
    ap.add_argument(
        "--min-dsir",
        type=float,
        default=None,
        help="drop documents whose DSIR log-ratio is below this floor; "
        "requires --dsir-target",
    )
    ap.add_argument(
        "--keep-dsir-pct",
        type=float,
        default=None,
        help="keep only the TOP P percent of documents by DSIR log-ratio "
        "(floor = approx (100-P)-th percentile, one percentile_approx "
        "aggregate — the importance-resampling form a corpus-scale tilt "
        "actually uses); requires --dsir-target, mutually exclusive with "
        "--min-dsir",
    )
    ap.add_argument(
        "--redact-pii",
        action="store_true",
        help="redact emails / IPv4s / phone numbers in the KEPT corpus text "
        "(typed placeholders, kgforge.operators.text.pii_redact); keep/ "
        "gains an n_pii column recording per-doc replacement counts",
    )
    ap.add_argument(
        "--dedup-paragraphs",
        action="store_true",
        help="rewrite the KEPT corpus with corpus-wide paragraph-level "
        "dedup (every paragraph keeps its first occurrence — the "
        "CCNet/C4-style boilerplate strip); keep/ gains an "
        "n_paras_removed column",
    )
    ap.add_argument(
        "--para-delim",
        default=r"\n{2,}",
        help="paragraph split regex for --dedup-paragraphs (rebuilt text "
        "joins with one blank line)",
    )
    ap.add_argument(
        "--strip-dup-substrings",
        type=int,
        default=None,
        metavar="K",
        help="rewrite the KEPT corpus with exact substring dedup: every "
        "duplicated K-word window keeps only its globally first occurrence "
        "(Lee et al. 2022; kgforge.operators.dedup.substring_dedup). "
        "NOTE: rebuilt text is whitespace/case-normalized. keep/ gains an "
        "n_words_stripped column",
    )
    ap.add_argument(
        "--substring-state",
        default=None,
        metavar="DIR",
        help="with --strip-dup-substrings: treat this run as ONE batch of a "
        "rolling corpus — strip against (and extend) the persistent "
        "first-occurrence registry at DIR "
        "(dedup.incremental_substring_dedup; doc ids must be monotone "
        "across runs)",
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

        spark = get_spark("kgforge-filter", master=args.master)

    from kgforge.operators import text

    docs = spark.read.parquet(args.docs)

    # multilingual stopword union: Gopher's stopword rule is English-specific;
    # a mixed-language corpus would mass-fail it, so the CLI unions the
    # langid marker words into the presence check
    stopwords = tuple(
        dict.fromkeys(
            list(text.STOPWORDS_EN)
            + [w for marks in text.LANG_MARKERS.values() for w in marks]
        )
    )
    # ONE fused projection for every per-row narrow signal (VERDICT r5 item
    # 5): rules + langid compute in the same select — a rules-only run is a
    # single corpus scan with zero exchanges (plan-gated in test_plans).
    # pred_lang is computed (and recorded in the audit) only when --lang
    # asks for it; the column is null otherwise, schema unchanged.
    audit = text.audit_signals(
        docs, stopwords=stopwords, include_lang=bool(args.lang)
    ).select(
        "doc_id", "ok_word_count", "ok_word_len", "ok_symbols", "ok_stopword",
        "ok_rules", "pred_lang",
    )
    rules_col = F.lit(True) if args.no_rules else F.col("ok_rules")

    if args.min_logprob is not None and args.drop_logprob_pct is not None:
        ap.error("--min-logprob and --drop-logprob-pct are mutually exclusive")
    lm_enabled = (
        args.min_logprob is not None
        or args.drop_logprob_pct is not None
        or args.audit_lm
    )
    floor = args.min_logprob
    if lm_enabled:
        # the unigram LM costs two corpus passes (vocabulary count + score
        # join); pay them ONLY when an LM floor or --audit-lm asks for the
        # signal — a rules-only run stays one corpus scan (VERDICT r4 item 6)
        lm = text.unigram_logprob(docs).select("doc_id", "avg_logprob")
        if args.drop_logprob_pct is not None:
            # one scalar aggregate (t-digest sketch), never a global sort
            floor = lm.agg(
                F.percentile_approx(
                    "avg_logprob", args.drop_logprob_pct / 100.0, 10_000
                ).alias("q")
            ).head().q
        # documents with zero words never appear in the LM relation: left
        # join + null floor treats them as failing any enabled floor
        audit = audit.join(lm, "doc_id", "left")
    else:
        # audit schema is stable either way; the column is null when unpaid
        audit = audit.withColumn("avg_logprob", F.lit(None).cast("double"))
    if floor is not None:
        lm_col = F.coalesce(F.col("avg_logprob") >= floor, F.lit(False))
    else:
        lm_col = F.lit(True)

    if args.min_bigram_logprob is not None:
        # bigram-LM passes (count tables + probe join) — paid only when the
        # floor is set, same gating as the unigram LM; docs with < 2 words
        # have no bigram row and fail the floor via the null coalesce
        blm = text.bigram_logprob(docs).select("doc_id", "avg_bigram_logprob")
        audit = audit.join(blm, "doc_id", "left")
        lm_col = lm_col & F.coalesce(
            F.col("avg_bigram_logprob") >= args.min_bigram_logprob, F.lit(False)
        )
    else:
        audit = audit.withColumn(
            "avg_bigram_logprob", F.lit(None).cast("double")
        )

    rep_enabled = (
        args.max_dup_line_frac is not None or args.max_dup_2gram_frac is not None
    )
    if rep_enabled:
        # within-document repetition (two explode+agg corpus passes) — paid
        # only when a repetition threshold is set, same gating as the LM
        rep = text.repetition_scores(
            docs,
            max_dup_line_frac=(
                args.max_dup_line_frac if args.max_dup_line_frac is not None else 1.0
            ),
            max_dup_2gram_char_frac=(
                args.max_dup_2gram_frac if args.max_dup_2gram_frac is not None else 1.0
            ),
        ).select("doc_id", "dup_line_frac", "dup_2gram_char_frac", F.col("rep_ok"))
        audit = audit.join(rep, "doc_id", "left")
        rep_col = F.coalesce(F.col("rep_ok"), F.lit(False))
    else:
        audit = (
            audit.withColumn("dup_line_frac", F.lit(None).cast("double"))
            .withColumn("dup_2gram_char_frac", F.lit(None).cast("double"))
        )
        rep_col = F.lit(True)

    if args.lang:
        allow = [x.strip() for x in args.lang.split(",") if x.strip()]
        lang_col = F.col("pred_lang").isin(allow)
    else:
        lang_col = F.lit(True)

    if args.decontaminate:
        # benchmark decontamination: the eval gram hashes broadcast, the
        # per-doc verdict joins back like the other aggregating signals
        eval_docs = spark.read.parquet(args.decontaminate)
        dec = text.decontaminate(docs, eval_docs, n=args.decontam_n).select(
            "doc_id", "eval_gram_hits", "is_contaminated"
        )
        audit = audit.join(dec, "doc_id", "left")
        # a doc missing from the verdict relation cannot happen (decontaminate
        # emits one row per input doc), but stay null-safe like the others
        dec_col = ~F.coalesce(F.col("is_contaminated"), F.lit(False))
    else:
        audit = audit.withColumn("eval_gram_hits", F.lit(None).cast("long"))
        dec_col = F.lit(True)

    if args.min_dsir is not None and args.keep_dsir_pct is not None:
        ap.error("--min-dsir and --keep-dsir-pct are mutually exclusive")
    if (args.min_dsir is not None or args.keep_dsir_pct is not None) and not args.dsir_target:
        ap.error("--min-dsir / --keep-dsir-pct require --dsir-target")
    dsir_floor = args.min_dsir
    if args.dsir_target:
        # DSIR tilt: bucketed feature models broadcast, the per-doc score
        # joins back like the other aggregating signals (two corpus gram
        # passes — paid only when a target is given)
        target = spark.read.parquet(args.dsir_target)
        dsir = text.importance_weights(docs, target).select(
            "doc_id", "dsir_logratio"
        )
        if args.keep_dsir_pct is not None:
            dsir_floor = dsir.agg(
                F.percentile_approx(
                    "dsir_logratio", 1.0 - args.keep_dsir_pct / 100.0, 10_000
                ).alias("q")
            ).head().q
        audit = audit.join(dsir, "doc_id", "left")
        if dsir_floor is not None:
            dsir_col = F.coalesce(F.col("dsir_logratio") >= dsir_floor, F.lit(False))
        else:
            dsir_col = F.lit(True)  # score-only run: audit records the ratio
    else:
        audit = audit.withColumn("dsir_logratio", F.lit(None).cast("double"))
        dsir_col = F.lit(True)

    audit = (
        audit.withColumn("ok_lm", lm_col)
        .withColumn("ok_lang", lang_col)
        .withColumn("ok_rep", rep_col)
        .withColumn("ok_decontam", dec_col)
        .withColumn("ok_dsir", dsir_col)
        .drop("rep_ok", "is_contaminated")  # superseded by the ok_* booleans
    )
    audit = audit.withColumn(
        "keep",
        rules_col & F.col("ok_lm") & F.col("ok_lang") & F.col("ok_rep")
        & F.col("ok_decontam") & F.col("ok_dsir"),
    )
    audit.write.mode("overwrite").parquet(os.path.join(args.out, "audit"))
    audit_r = spark.read.parquet(os.path.join(args.out, "audit"))

    keep = docs.join(
        audit_r.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    if args.dedup_paragraphs:
        # corpus-wide rewrite over the KEPT rows (runs after the drop
        # filters so dropped docs can't claim first occurrence); only
        # (id, pos, hash) rows shuffle inside the operator, and the
        # rewritten text + removal count join back on doc_id
        from kgforge.operators import dedup as dedup_ops

        pd_out = dedup_ops.paragraph_dedup(keep, split_re=args.para_delim).select(
            "doc_id",
            F.col("text").alias("_pd_text"),
            F.col("n_removed").alias("n_paras_removed"),
        )
        keep = keep.drop("text").join(pd_out, "doc_id").withColumnRenamed(
            "_pd_text", "text"
        )
    if args.strip_dup_substrings:
        # runs AFTER paragraph dedup (whole-paragraph repeats are cheaper to
        # remove at paragraph granularity; the window pass then catches
        # sub-paragraph boilerplate).  Only fixed-width (id, pos, hash) rows
        # shuffle inside the operator; rebuilt text is normalized.
        from kgforge.operators import dedup as dedup_ops

        if args.substring_state:
            sd = dedup_ops.incremental_substring_dedup(
                spark, keep, args.substring_state, k=args.strip_dup_substrings
            )
        else:
            sd = dedup_ops.substring_dedup(keep, k=args.strip_dup_substrings)
        sd_out = sd.select(
            "doc_id",
            F.col("text").alias("_sd_text"),
            F.col("n_stripped").alias("n_words_stripped"),
        )
        keep = keep.drop("text").join(sd_out, "doc_id").withColumnRenamed(
            "_sd_text", "text"
        )
    if args.redact_pii:
        # redaction is a narrow projection over the kept rows — it rides the
        # same write, adding zero passes; n_pii ships in keep/ so downstream
        # stages can audit the scrub without re-running the regexes
        keep = text.pii_redact(keep)
    keep.write.mode("overwrite").parquet(os.path.join(args.out, "keep"))

    # dict-sized decision summary in one aggregation pass
    row = audit_r.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("int")).alias("n_kept"),
        F.sum((~F.col("ok_rules")).cast("int")).alias("fail_rules"),
        F.sum((~F.col("ok_lm")).cast("int")).alias("fail_lm"),
        F.sum((~F.col("ok_lang")).cast("int")).alias("fail_lang"),
        F.sum((~F.col("ok_rep")).cast("int")).alias("fail_rep"),
        F.sum((~F.col("ok_decontam")).cast("int")).alias("fail_decontam"),
        F.sum((~F.col("ok_dsir")).cast("int")).alias("fail_dsir"),
    ).head()
    n_paras_removed = None
    if args.dedup_paragraphs:
        n_paras_removed = (
            spark.read.parquet(os.path.join(args.out, "keep"))
            .agg(F.sum("n_paras_removed").alias("s"))
            .head()
            .s
        )
    n_words_stripped = None
    if args.strip_dup_substrings:
        n_words_stripped = (
            spark.read.parquet(os.path.join(args.out, "keep"))
            .agg(F.sum("n_words_stripped").alias("s"))
            .head()
            .s
        )
    n_pii_redacted = None
    if args.redact_pii:
        # column-pruned scan of the just-written keep/ parquet
        n_pii_redacted = (
            spark.read.parquet(os.path.join(args.out, "keep"))
            .agg(F.sum("n_pii").alias("s"))
            .head()
            .s
        )
    metrics = {
        "n_docs": row.n_docs,
        "n_kept": row.n_kept,
        "drop_rate": round((row.n_docs - row.n_kept) / max(row.n_docs, 1), 4),
        "fail_rules": row.fail_rules,
        "fail_lm": row.fail_lm,
        "fail_lang": row.fail_lang,
        "fail_rep": row.fail_rep,
        "fail_decontam": row.fail_decontam,
        "fail_dsir": row.fail_dsir,
        "n_paras_removed": n_paras_removed,
        "n_words_stripped": n_words_stripped,
        "n_pii_redacted": n_pii_redacted,
        "filters": {
            "rules": not args.no_rules,
            "min_logprob": args.min_logprob,
            "drop_logprob_pct": args.drop_logprob_pct,
            "lm_floor": None if floor is None else round(floor, 5),
            "min_bigram_logprob": args.min_bigram_logprob,
            "lang": args.lang,
            "max_dup_line_frac": args.max_dup_line_frac,
            "max_dup_2gram_frac": args.max_dup_2gram_frac,
            "decontaminate": args.decontaminate,
            "decontam_n": args.decontam_n if args.decontaminate else None,
            "dsir_target": args.dsir_target,
            "dsir_floor": None if dsir_floor is None else round(dsir_floor, 5),
            "dedup_paragraphs": args.dedup_paragraphs,
            "strip_dup_substrings": args.strip_dup_substrings,
            "substring_state": args.substring_state,
            "redact_pii": args.redact_pii,
        },
    }
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
