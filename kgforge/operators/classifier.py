"""Hashed bag-of-words quality classifier (round 6) — the GPT-3/LLaMA-style
curation component: a logistic regression over hashed word features, trained
"curated target vs random crawl", whose positive-class probability ranks or
pagination-filters a 100 TB corpus.

Built on pyspark.ml deliberately (the Spark-idiomatic path — SURVEY.md's
"don't hand-schedule what the framework already does"): `HashingTF` buckets
tokens into a fixed-width sparse vector JVM-side, and `LogisticRegression`
trains with distributed L-BFGS over `treeAggregate` partial gradients — no
driver-side data beyond the coefficient vector (n_features doubles), no
Python in either the train or the score path.

Scale notes: the training set in a real pipeline is a bounded curated
sample (positives = the quality domain, negatives = a same-sized random
draw of the crawl), so the expensive distributed part is SCORING — here a
single `model.transform` projection that broadcasts the coefficient
vector.  Tokenization reuses text.TOKEN_RE via RegexTokenizer so the
classifier sees the same token stream every other text operator budgets
on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kgforge.operators.text import TOKEN_RE


def _pipeline(n_features: int, max_iter: int, reg: float):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol="text", outputCol="_toks", pattern=TOKEN_RE, gaps=False,
        toLowercase=True,
    )
    tf = HashingTF(inputCol="_toks", outputCol="features", numFeatures=n_features)
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=max_iter,
        regParam=reg, standardization=False,
    )
    return Pipeline(stages=[tok, tf, lr])


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    n_features: int = 1 << 18,
    max_iter: int = 50,
    reg: float = 1e-4,
    text_col: str = "text",
):
    """Fit the classifier: positives = curated quality domain, negatives =
    random crawl sample (label 1/0).  Returns the fitted PipelineModel —
    persist with model.write() beside the corpus for reproducible scoring.
    Both inputs only need ``text_col``."""
    train = positives.select(
        F.coalesce(F.col(text_col), F.lit("")).alias("text"), F.lit(1.0).alias("label")
    ).unionByName(
        negatives.select(
            F.coalesce(F.col(text_col), F.lit("")).alias("text"),
            F.lit(0.0).alias("label"),
        )
    )
    return _pipeline(n_features, max_iter, reg).fit(train)


def score_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, quality_prob): positive-class probability per document —
    one JVM projection chain (tokenize -> hash -> dot with the broadcast
    coefficients -> sigmoid); no shuffle, no Python."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        docs.select(
            F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("text")
        )
    )
    return scored.select(
        id_col, vector_to_array("probability")[1].alias("quality_prob")
    )
