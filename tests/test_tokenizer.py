"""BPE tokenizer gates: golden equivalence vs an independent naive
reference trainer (full pair recount every iteration — the textbook
algorithm, deliberately unoptimized), encode/detokenize roundtrip,
partitioning invariance, model persistence, and pack integration."""

import pytest
from pyspark.sql import functions as F

from kgforge.operators import tokenizer as tk
from kgforge.operators.packing import pack_documents

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest widest new",
]


def naive_bpe(histogram, n_merges, min_count=2):
    """Textbook BPE: recount every pair over the whole histogram each
    iteration.  Quadratic and slow — exists only to pin the incremental
    trainer's semantics."""
    words = {i: tuple(w) + (tk.END,) for i, (w, _) in enumerate(histogram)}
    counts = {i: c for i, (_, c) in enumerate(histogram)}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for i, sym in words.items():
            for p in zip(sym, sym[1:]):
                pc[p] = pc.get(p, 0) + counts[i]
        eligible = {p: c for p, c in pc.items() if c >= min_count}
        if not eligible:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest pair
        top = max(eligible.values())
        pair = min(p for p, c in eligible.items() if c == top)
        merges.append(pair)
        a, b = pair
        for i, sym in list(words.items()):
            out, j = [], 0
            while j < len(sym):
                if j < len(sym) - 1 and sym[j] == a and sym[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = tuple(out)
    return tuple(merges)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_trainer_matches_naive_reference(docs):
    hist = tk.word_histogram(docs)
    assert hist[0] == ("newest", 7)  # count desc, word asc
    fast = tk._learn_merges(hist, 12, min_count=2)
    slow = naive_bpe(hist, 12, min_count=2)
    assert fast == slow
    assert len(fast) > 0
    # classic corpus: 'es'/'est'-family merges must surface early
    joined = ["".join(p) for p in fast]
    assert any("est" in m or "es" in m for m in joined[:4])


def test_trainer_stops_at_min_count(docs):
    model = tk.train_bpe(docs, n_merges=10_000, min_count=2)
    # merges are finite even with an absurd budget: no pair below min_count
    assert 0 < len(model.merges) < 200


def test_encode_roundtrip_and_counts(spark, docs):
    model = tk.train_bpe(docs, n_merges=50)
    enc = tk.encode_bpe(docs, model).orderBy("doc_id").collect()
    import re

    for row, text in zip(enc, CORPUS):
        assert tk.detokenize(row["tokens"]) == " ".join(re.findall(tk.TOKEN_RE, text))
        assert row["n_tokens"] == len(row["tokens"])
        # merges compress: never more tokens than characters+markers
        assert row["n_tokens"] <= sum(len(w) + 1 for w in text.split())


def test_encode_partitioning_invariant(spark, docs):
    model = tk.train_bpe(docs, n_merges=50)
    a = {
        r["doc_id"]: tuple(r["tokens"])
        for r in tk.encode_bpe(docs.repartition(7), model).collect()
    }
    b = {
        r["doc_id"]: tuple(r["tokens"])
        for r in tk.encode_bpe(docs.coalesce(1), model).collect()
    }
    assert a == b


def test_model_df_roundtrip(spark, docs):
    model = tk.train_bpe(docs, n_merges=30)
    back = tk.BPEModel.from_df(model.to_df(spark))
    assert back.merges == model.merges


def test_histogram_cap_is_deterministic(spark):
    rows = [(i, "aa bb cc dd ee ff gg aa bb cc") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    h4 = tk.word_histogram(docs, max_word_types=4)
    # all counts tie -> cap resolves lexicographically
    assert [w for w, _ in h4] == ["aa", "bb", "cc", "dd"][: len(h4)]


def test_pack_on_bpe_token_counts(spark, docs):
    model = tk.train_bpe(docs, n_merges=50)
    enc = tk.encode_bpe(docs, model).select("doc_id", "n_tokens")
    sized = docs.join(enc, "doc_id")
    packed = pack_documents(sized, budget_tokens=16, n_bins=2, token_col="n_tokens")
    rows = packed.collect()
    assert {r["doc_id"] for r in rows} == set(range(len(CORPUS)))
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for members in by_pack.values():
        total = sum(m["n_tokens"] for m in members)
        assert total == members[0]["pack_tokens"]
        assert total <= 16 or (len(members) == 1 and members[0]["oversize"])


def test_unknown_symbols_pass_through(spark, docs):
    model = tk.train_bpe(docs, n_merges=50)
    other = spark.createDataFrame([(0, "zzzq low")], "doc_id long, text string")
    row = tk.encode_bpe(other, model).collect()[0]
    assert tk.detokenize(row["tokens"]) == "zzzq low"
    # unseen word degrades to characters + end marker, never crashes
    assert row["n_tokens"] >= 5
