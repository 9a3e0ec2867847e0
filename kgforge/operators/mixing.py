"""Corpus mixing: deterministic per-domain up/down-sampling (round 6) —
the data-mixture step between quality filtering and sequence packing in an
LLM training pipeline.  A corpus is rarely trained at its natural domain
proportions; the standard recipe assigns each domain (language, source,
quality tier) a sampling RATE: rate < 1 downsamples, rate > 1 upsamples by
repetition (e.g. 2.5 = every doc twice, half the docs a third time).

Design rules (the hash_split discipline applied to sampling):

* CONTENT-KEYED, not random: the keep/repeat decision hashes (salt, key),
  so it survives re-runs, repartitioning, engine changes and joins across
  derived tables — a document can never flip in or out of the mixture
  between pipeline executions, and two mixtures with different salts draw
  independent decisions.
* Rate map is dict-sized (domains), so it compiles to a literal CASE chain
  — no join, no shuffle, one narrow whole-stage-codegen projection over
  the corpus; the DuckDB oracle replays the identical arithmetic
  (registry `corpus_mix`).
* Upsampling materializes via sequence+explode (narrow), emitting a
  `copy` ordinal so downstream shuffles/packing see distinct rows.

Fractional rates resolve at micro-unit precision (1e-6) — the same
bucket arithmetic as hash_split, mod 1,000,000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000


def _bucket(key_col: str, salt: str) -> F.Column:
    """First 8 hex digits of md5(salt || key) mod 1e6 — uniform on [0, 1e6);
    identical expression to hash_split's (different salt => independent)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % MICRO
    )


def mixture_counts(
    docs: DataFrame,
    rates: dict,
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix1",
    default_rate: float = 1.0,
) -> DataFrame:
    """docs.* + (mix_bucket, n_copies): how many times each document appears
    in the mixture.  n_copies = floor(rate) + 1{bucket < frac(rate) * 1e6}
    for the row's group rate (``default_rate`` for unlisted groups) — i.e.
    rate 0.25 keeps a deterministic quarter, rate 2.5 emits 2 copies always
    and a third for half the keys.  Rates must be non-negative; micro-unit
    (1e-6) precision."""
    for g, r in rates.items():
        if r < 0:
            raise ValueError(f"negative sampling rate {r} for group {g!r}")
    if default_rate < 0:
        raise ValueError(f"negative default sampling rate {default_rate}")

    def parts(rate: float) -> tuple:
        base = int(rate)
        return base, int(round((rate - base) * MICRO))

    d_base, d_frac = parts(default_rate)
    base_col, frac_col = F.lit(d_base), F.lit(d_frac)
    for g, r in rates.items():
        b, fr = parts(r)
        cond = F.col(group_col) == F.lit(g)
        base_col = F.when(cond, F.lit(b)).otherwise(base_col)
        frac_col = F.when(cond, F.lit(fr)).otherwise(frac_col)
    bucket = _bucket(key_col, salt)
    return docs.withColumn("mix_bucket", bucket).withColumn(
        "n_copies",
        (base_col + (F.col("mix_bucket") < frac_col).cast("int")).cast("int"),
    )


def materialize_mixture(
    docs: DataFrame,
    rates: dict,
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix1",
    default_rate: float = 1.0,
) -> DataFrame:
    """The mixture as physical rows: every document repeated ``n_copies``
    times with a 0-based ``copy`` ordinal (so downstream dedup-sensitive
    stages can tell repeats apart or key on (id, copy)).  Narrow
    sequence+explode — zero shuffle; rows with n_copies = 0 vanish."""
    counts = mixture_counts(docs, rates, group_col, key_col, salt, default_rate)
    return (
        counts.filter(F.col("n_copies") > 0)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1))
        )
        .drop("n_copies")
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    seed: str = "shuf1",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic seeded GLOBAL shuffle + shard assignment (round 6):
    the last corpus-assembly step before writing training shards, where
    examples must be well-mixed (no source/domain runs — SGD sees an
    i.i.d.-looking stream) yet bit-reproducible across re-runs, engines
    and partitionings.  ``.orderBy(rand())`` gives neither property.

    Every row keys on md5(seed || key): the first 8 hex digits pick the
    shard, the remaining 24 order rows WITHIN the shard — one content-keyed
    exchange on the shard id plus a per-shard sort, exactly the shape of a
    sharded writer (`repartition(shard).sortWithinPartitions(sort_key)`).
    Size ``n_shards`` so one shard fits a task (the standard shard-writer
    contract, same sizing rule as partitioned_write); change ``seed`` for
    an independent epoch order.  md5 arithmetic is ANSI-SQL-replayable, so
    the full (shard, pos) assignment is value-oracle-checked (registry
    `corpus_shuffle`).

    Returns (key, shard, pos): pos is the row's 1-based rank within its
    shard — (shard, pos) is a total order over the corpus.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    keyed = df.select(
        F.col(key_col),
        (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards)
        .cast("int")
        .alias("shard"),
        F.substring(key, 9, 24).alias("_sk"),
    )
    w = Window.partitionBy("shard").orderBy("_sk", key_col)
    return keyed.withColumn("pos", F.row_number().over(w)).drop("_sk")
