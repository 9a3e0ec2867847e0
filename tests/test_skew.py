"""J9 skew handling: salted aggregation equivalence and hot-predicate spread
(SURVEY.md 5.2 scale/skew smoke)."""

from pyspark.sql import functions as F

from kgforge.operators.triples import HOT_PREDICATES, salted_count


def test_salted_count_equals_plain_on_skew(spark):
    # 100k rows, 90% one hot key — the shape that melts a naive groupBy task
    df = spark.range(100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("payload"),
    )
    got = {r.k: r["count"] for r in salted_count(df, ["k"], n_salts=16).collect()}
    exp = {r.k: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert got == exp


def test_salted_partial_splits_hot_key(spark):
    df = spark.range(50_000).select(F.lit("hot").alias("k"), F.col("id").alias("payload"))
    salt = F.pmod(F.xxhash64("payload"), F.lit(16))
    n_salts = df.select(salt.alias("s")).distinct().count()
    assert n_salts == 16  # the hot key's partial aggregation spreads 16 ways


def test_write_graph_salts_hot_predicates(spark, tmpdir_path):
    from kgforge.operators.triples import write_graph

    hot = HOT_PREDICATES[0]
    df = spark.range(20_000).select(
        F.concat(F.lit("dbr:E"), F.col("id").cast("string")).alias("subj"),
        F.when(F.col("id") % 10 < 9, F.lit(hot)).otherwise(F.lit("<http://x/cold>")).alias("pred"),
        F.lit("dbr:E_obj").alias("obj"),
        F.lit(1).cast("long").alias("src_count"),
        F.array().cast("array<struct<repo:string,path:string,commit:string,content_sha256:string>>").alias("lineage"),
    )
    out = f"{tmpdir_path}/graph"
    write_graph(df, out, n_buckets=8)
    back = spark.read.parquet(out)
    assert back.count() == 20_000
    # hot predicate rows spread across >1 task at write: verify via the salt
    salt = F.pmod(F.xxhash64("subj"), F.lit(8))
    n = (
        back.filter(F.col("pred") == hot)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n == 8
