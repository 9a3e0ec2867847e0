"""filter_corpus CLI (jobs/filter_corpus.py): keep/audit outputs and the
one-line JSON metrics over a corpus with planted quality violations."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog in the garden"),  # clean en
    (1, "le chat et la maison les arbres des fleurs dans le jardin"),  # clean fr
    (2, "ok"),  # fails word-count rule
    (3, "@@@@ #### $$$$ %%%% ^^^^ &&&& ****"),  # fails symbols + stopword
    (4, "el perro y los gatos una casa en la calle"),  # clean es
]


@pytest.fixture()
def docs_path(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "fdocs.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(p)
    return p


def _run(docs_path, out, capsys, *extra):
    import filter_corpus

    rc = filter_corpus.main(["--docs", docs_path, "--out", out, *extra])
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_rules_only_drops_planted_violations(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "f_rules")
    m = _run(docs_path, out, capsys)
    assert m["n_docs"] == 5 and m["fail_rules"] == 2 and m["n_kept"] == 3
    kept = {r.doc_id for r in spark.read.parquet(os.path.join(out, "keep")).collect()}
    assert kept == {0, 1, 4}
    audit = {r.doc_id: r for r in spark.read.parquet(os.path.join(out, "audit")).collect()}
    assert not audit[2].ok_word_count and not audit[3].ok_symbols


def test_lang_allowlist_composes(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "f_lang")
    m = _run(docs_path, out, capsys, "--lang", "en,fr")
    kept = {r.doc_id for r in spark.read.parquet(os.path.join(out, "keep")).collect()}
    assert kept == {0, 1}  # es doc dropped by language, rule-violators by rules
    assert m["fail_lang"] >= 1


def test_logprob_floor_drops_everything_at_zero(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "f_lm")
    # avg log-prob is always < 0, so a floor of 0 drops every document
    m = _run(docs_path, out, capsys, "--min-logprob", "0", "--no-rules")
    assert m["n_kept"] == 0 and m["fail_lm"] == 5


def test_percentile_floor_drops_worst_scorers(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "f_pct")
    m = _run(docs_path, out, capsys, "--drop-logprob-pct", "60", "--no-rules")
    assert m["filters"]["lm_floor"] is not None
    assert 0 < m["fail_lm"] < m["n_docs"]  # some but not all dropped
    # the floor is a real percentile: kept docs all score >= it
    audit = spark.read.parquet(os.path.join(out, "audit"))
    kept_scores = [r.avg_logprob for r in audit.filter("keep").collect()]
    assert all(s >= m["filters"]["lm_floor"] for s in kept_scores)


def test_rules_only_run_never_pays_the_lm_passes(spark, docs_path, tmpdir_path, capsys, monkeypatch):
    """Without an LM floor or --audit-lm, the two unigram-LM corpus passes
    must not run at all (VERDICT r4 item 6) — asserted by making the LM
    operator raise — and the audit's avg_logprob column is null."""
    from kgforge.operators import text

    def _boom(*a, **k):
        raise AssertionError("unigram_logprob must not be invoked on a rules-only run")

    monkeypatch.setattr(text, "unigram_logprob", _boom)
    out = os.path.join(tmpdir_path, "f_nolm")
    m = _run(docs_path, out, capsys)
    assert m["n_docs"] == 5 and m["fail_lm"] == 0
    audit = spark.read.parquet(os.path.join(out, "audit"))
    assert "avg_logprob" in audit.columns  # schema stable even when unpaid
    assert audit.filter(F.col("avg_logprob").isNotNull()).count() == 0


def test_audit_lm_records_scores_without_filtering(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "f_auditlm")
    m = _run(docs_path, out, capsys, "--audit-lm")
    assert m["fail_lm"] == 0  # no floor -> the LM never drops
    audit = spark.read.parquet(os.path.join(out, "audit"))
    # every doc with words carries a real score (doc 3 is all symbols ->
    # its tokens still count as words for the unigram LM)
    assert audit.filter(F.col("avg_logprob").isNotNull()).count() >= 4


def test_repetition_filter_drops_repetitive_doc(spark, tmpdir_path, capsys):
    """--max-dup-line-frac drops a planted line-repeating doc; clean docs
    pass; without the flag the repetition passes never run (monkeypatch-
    style gate mirrors the LM one) and the audit columns are null."""
    docs = DOCS + [(9, "copy paste\ncopy paste\ncopy paste\ncopy paste")]
    p = os.path.join(tmpdir_path, "rdocs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(p)
    out = os.path.join(tmpdir_path, "f_rep")
    m = _run(p, out, capsys, "--max-dup-line-frac", "0.3", "--no-rules")
    assert m["fail_rep"] == 1
    audit = {r.doc_id: r for r in spark.read.parquet(os.path.join(out, "audit")).collect()}
    assert audit[9].dup_line_frac == 0.75 and not audit[9].keep
    assert audit[0].keep


def test_rules_only_run_never_pays_repetition(spark, docs_path, tmpdir_path, capsys, monkeypatch):
    from kgforge.operators import text

    def _boom(*a, **k):
        raise AssertionError("repetition_scores must not run without a threshold")

    monkeypatch.setattr(text, "repetition_scores", _boom)
    out = os.path.join(tmpdir_path, "f_norep")
    m = _run(docs_path, out, capsys)
    assert m["fail_rep"] == 0
    audit = spark.read.parquet(os.path.join(out, "audit"))
    assert audit.filter(F.col("dup_line_frac").isNotNull()).count() == 0


def test_min_logprob_and_pct_are_exclusive(docs_path, tmpdir_path):
    import filter_corpus

    with pytest.raises(SystemExit):
        filter_corpus.main([
            "--docs", docs_path, "--out", os.path.join(tmpdir_path, "f_x"),
            "--min-logprob", "-9", "--drop-logprob-pct", "5",
        ])


def test_decontaminate_drops_overlapping_doc(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "f_dec")
    ev = os.path.join(tmpdir_path, "f_eval.parquet")
    # eval set shares a 4-gram with doc 0 ("quick brown fox jumps") only
    spark.createDataFrame(
        [(99, "the quick brown fox jumps high")], "doc_id long, text string"
    ).write.parquet(ev)
    m = _run(docs_path, out, capsys, "--decontaminate", ev, "--decontam-n", "4")
    kept = {r.doc_id for r in spark.read.parquet(os.path.join(out, "keep")).collect()}
    assert kept == {1, 4}  # doc 0 contaminated; 2,3 fail rules
    assert m["fail_decontam"] == 1
    audit = {r.doc_id: r for r in spark.read.parquet(os.path.join(out, "audit")).collect()}
    assert audit[0].eval_gram_hits >= 1 and not audit[0].ok_decontam
    assert audit[1].eval_gram_hits == 0 and audit[1].ok_decontam


def test_redact_pii_scrubs_kept_text(spark, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "f_pii")
    p = os.path.join(tmpdir_path, "f_pii_docs.parquet")
    spark.createDataFrame(
        [
            (0, "the quick brown fox email alice@example.com and the end here now"),
            (1, "le chat et la maison les arbres des fleurs dans le jardin"),
        ],
        "doc_id long, text string",
    ).write.parquet(p)
    m = _run(p, out, capsys, "--redact-pii")
    kept = {r.doc_id: r for r in spark.read.parquet(os.path.join(out, "keep")).collect()}
    assert "<EMAIL>" in kept[0].text and "alice@example.com" not in kept[0].text
    assert kept[0].n_pii == 1 and kept[1].n_pii == 0
    assert m["n_pii_redacted"] == 1


def test_rules_only_run_never_pays_decontam_or_pii(
    spark, docs_path, tmpdir_path, capsys, monkeypatch
):
    from kgforge.operators import text as text_ops

    def boom(*a, **k):  # pragma: no cover - fails the test if invoked
        raise AssertionError("decontaminate/pii must not run without their flags")

    monkeypatch.setattr(text_ops, "decontaminate", boom)
    monkeypatch.setattr(text_ops, "pii_redact", boom)
    out = os.path.join(tmpdir_path, "f_nodec")
    m = _run(docs_path, out, capsys)
    assert m["fail_decontam"] == 0 and m["n_pii_redacted"] is None


def test_dsir_tilt_keeps_target_like_docs(spark, docs_path, tmpdir_path, capsys):
    """--dsir-target + --keep-dsir-pct: the doc sharing the target's
    bigrams survives the tilt; off-domain clean docs fall below the floor."""
    out = os.path.join(tmpdir_path, "f_dsir")
    tgt = os.path.join(tmpdir_path, "f_target.parquet")
    # target domain = doc 0's english garden register
    spark.createDataFrame(
        [(90, "the quick brown fox jumps over the lazy dog"),
         (91, "brown fox in the garden over the lazy dog")],
        "doc_id long, text string",
    ).write.parquet(tgt)
    m = _run(docs_path, out, capsys, "--dsir-target", tgt,
             "--keep-dsir-pct", "25")
    kept = {r.doc_id for r in spark.read.parquet(os.path.join(out, "keep")).collect()}
    assert kept == {0}
    assert m["fail_dsir"] >= 2 and m["filters"]["dsir_floor"] is not None
    audit = {r.doc_id: r for r in spark.read.parquet(os.path.join(out, "audit")).collect()}
    assert audit[0].dsir_logratio > audit[1].dsir_logratio
    assert audit[0].ok_dsir and not audit[1].ok_dsir


def test_dsir_score_only_records_without_filtering(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "f_dsir_audit")
    tgt = os.path.join(tmpdir_path, "f_target2.parquet")
    spark.createDataFrame(
        [(90, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    ).write.parquet(tgt)
    m = _run(docs_path, out, capsys, "--dsir-target", tgt)
    assert m["fail_dsir"] == 0  # no floor -> score-only
    audit = {r.doc_id: r for r in spark.read.parquet(os.path.join(out, "audit")).collect()}
    assert audit[0].dsir_logratio is not None


def test_dsir_flags_validated(docs_path, tmpdir_path):
    import filter_corpus

    with pytest.raises(SystemExit):
        filter_corpus.main(["--docs", docs_path, "--out", tmpdir_path,
                            "--min-dsir", "0.0"])  # floor without target
    with pytest.raises(SystemExit):
        filter_corpus.main(["--docs", docs_path, "--out", tmpdir_path,
                            "--dsir-target", docs_path,
                            "--min-dsir", "0", "--keep-dsir-pct", "10"])


def test_rules_only_run_never_pays_dsir(spark, docs_path, tmpdir_path, capsys, monkeypatch):
    from kgforge.operators import text as text_ops

    def boom(*a, **k):  # pragma: no cover - fails the test if invoked
        raise AssertionError("importance_weights must not run without --dsir-target")

    monkeypatch.setattr(text_ops, "importance_weights", boom)
    out = os.path.join(tmpdir_path, "f_nodsir")
    m = _run(docs_path, out, capsys)
    assert m["fail_dsir"] == 0


def test_dedup_paragraphs_rewrites_kept_text(spark, tmpdir_path, capsys):
    """--dedup-paragraphs: a boilerplate block repeated across kept docs
    survives only in the first; dropped docs never claim first occurrence."""
    out = os.path.join(tmpdir_path, "f_pd")
    p = os.path.join(tmpdir_path, "f_pd_docs.parquet")
    boiler = "the shared legal footer about the site and its terms here"
    spark.createDataFrame(
        [
            (0, f"the quick brown fox jumps over the lazy dog\n\n{boiler}"),
            (1, f"le chat et la maison les arbres des fleurs ici\n\n{boiler}"),
            (2, "ok"),  # fails rules -> dropped BEFORE the rewrite
        ],
        "doc_id long, text string",
    ).write.parquet(p)
    m = _run(p, out, capsys, "--dedup-paragraphs")
    kept = {r.doc_id: r for r in spark.read.parquet(os.path.join(out, "keep")).collect()}
    assert set(kept) == {0, 1}
    assert boiler in kept[0].text and boiler not in kept[1].text
    assert kept[0].n_paras_removed == 0 and kept[1].n_paras_removed == 1
    assert m["n_paras_removed"] == 1


def test_rules_only_run_never_pays_paragraph_dedup(
    spark, docs_path, tmpdir_path, capsys, monkeypatch
):
    from kgforge.operators import dedup as dedup_ops

    def boom(*a, **k):  # pragma: no cover - fails the test if invoked
        raise AssertionError("paragraph_dedup must not run without its flag")

    monkeypatch.setattr(dedup_ops, "paragraph_dedup", boom)
    out = os.path.join(tmpdir_path, "f_nopd")
    m = _run(docs_path, out, capsys)
    assert m["n_paras_removed"] is None


def test_strip_dup_substrings_rewrites_kept_text(spark, tmpdir_path, capsys):
    """--strip-dup-substrings K: a sentence quoted verbatim across kept docs
    survives only at its globally first occurrence; rebuilt text is
    normalized (lowercase, single-space)."""
    out = os.path.join(tmpdir_path, "f_sd")
    p = os.path.join(tmpdir_path, "f_sd_docs.parquet")
    quote = "the shared boilerplate sentence that repeats across documents"
    spark.createDataFrame(
        [
            (0, f"the quick brown fox jumps over the lazy dog and {quote}"),
            (1, f"le chat et la maison les arbres des fleurs {quote} encore"),
            (2, "ok"),  # fails rules -> dropped BEFORE the rewrite
        ],
        "doc_id long, text string",
    ).write.parquet(p)
    m = _run(p, out, capsys, "--strip-dup-substrings", "5")
    kept = {r.doc_id: r for r in spark.read.parquet(os.path.join(out, "keep")).collect()}
    assert set(kept) == {0, 1}
    assert quote in kept[0].text and quote not in kept[1].text
    assert kept[0].n_words_stripped == 0
    assert kept[1].n_words_stripped == len(quote.split())
    assert m["n_words_stripped"] == len(quote.split())


def test_substring_state_strips_across_runs(spark, tmpdir_path, capsys):
    """--substring-state: a second CLI run over NEW docs strips text whose
    first occurrence lives in the FIRST run's batch."""
    quote = "the shared boilerplate sentence that repeats across documents"
    state = os.path.join(tmpdir_path, "f_ss_state")
    p1 = os.path.join(tmpdir_path, "f_ss1.parquet")
    p2 = os.path.join(tmpdir_path, "f_ss2.parquet")
    spark.createDataFrame(
        [(0, f"the quick brown fox jumps over a dog and {quote}")],
        "doc_id long, text string",
    ).write.parquet(p1)
    spark.createDataFrame(
        [(10, f"le chat et la maison les arbres des fleurs {quote}")],
        "doc_id long, text string",
    ).write.parquet(p2)
    m1 = _run(p1, os.path.join(tmpdir_path, "f_ss_o1"), capsys,
              "--strip-dup-substrings", "5", "--substring-state", state)
    assert m1["n_words_stripped"] == 0
    m2 = _run(p2, os.path.join(tmpdir_path, "f_ss_o2"), capsys,
              "--strip-dup-substrings", "5", "--substring-state", state)
    assert m2["n_words_stripped"] == len(quote.split())
    (r,) = spark.read.parquet(
        os.path.join(tmpdir_path, "f_ss_o2", "keep")
    ).collect()
    assert quote not in r.text and r.text.startswith("le chat")


def test_rules_only_run_never_pays_substring_dedup(
    spark, docs_path, tmpdir_path, capsys, monkeypatch
):
    from kgforge.operators import dedup as dedup_ops

    def boom(*a, **k):  # pragma: no cover - fails the test if invoked
        raise AssertionError("substring_dedup must not run without its flag")

    monkeypatch.setattr(dedup_ops, "substring_dedup", boom)
    out = os.path.join(tmpdir_path, "f_nosd")
    m = _run(docs_path, out, capsys)
    assert m["n_words_stripped"] is None


def test_bigram_floor_drops_scrambled_doc(spark, tmpdir_path, capsys):
    """--min-bigram-logprob: word-salad (plausible unigrams, implausible
    transitions) falls below a floor the on-distribution docs clear."""
    out = os.path.join(tmpdir_path, "f_blm")
    p = os.path.join(tmpdir_path, "f_blm_docs.parquet")
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((100, "fox the jumps dog brown lazy quick the over"))
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    m0 = _run(p, os.path.join(tmpdir_path, "f_blm0"), capsys)  # no floor
    assert m0["n_kept"] == 21
    m = _run(p, out, capsys, "--min-bigram-logprob", "-1.5")
    kept = {r.doc_id for r in spark.read.parquet(os.path.join(out, "keep")).collect()}
    assert 100 not in kept and 0 in kept
    audit = {r.doc_id: r for r in spark.read.parquet(os.path.join(out, "audit")).collect()}
    assert audit[100].avg_bigram_logprob < -1.5 < audit[0].avg_bigram_logprob
    assert m["filters"]["min_bigram_logprob"] == -1.5


def test_rules_only_run_never_pays_bigram_lm(
    spark, docs_path, tmpdir_path, capsys, monkeypatch
):
    from kgforge.operators import text as text_ops

    def boom(*a, **k):  # pragma: no cover - fails the test if invoked
        raise AssertionError("bigram_logprob must not run without its floor")

    monkeypatch.setattr(text_ops, "bigram_logprob", boom)
    out = os.path.join(tmpdir_path, "f_noblm")
    m = _run(docs_path, out, capsys)
    assert m["filters"]["min_bigram_logprob"] is None
