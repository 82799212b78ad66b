"""Multinomial Naive Bayes text classification, aggregation-only.

The standard quality/language gate in front of a pretraining corpus is
a cheap linear text classifier (CCNet's fastText language ID, GPT-style
quality filters). Multinomial NB is the aggregation-native member of
that family: training is ONE grouped count over exploded tokens, the
model is a token -> log-likelihood-ratio table, and scoring is one
join + one integer sum — no gradient loop, no UDF, nothing that isn't
a Catalyst aggregate. The reference pipeline's row filters
(`credit-prepare-api/inv_old_processor.py` static predicates) have no
learned analogue; this supplies it in a shape that is embarrassingly
scalable.

Scale/determinism contract (same discipline as
``textstats.unigram_nll_scores``):

- Per-token log-likelihood ratios are quantized to 1e-6
  (``round(llr * 1e6) -> int64``) BEFORE the per-document sum, so
  scores are exact integers — bit-identical across engines, cluster
  sizes, and partitionings.
- Training is one map-side-combined aggregation; shuffle volume is
  distinct-tokens-per-partition (Zipf-collapsed), not corpus size.
- The score join keys on the token string against the model table
  and is pinned MERGE: unhinted, the static planner broadcasts the
  held-out token EXPLODE (its size estimate flows through the
  md5-split filter and comes out tiny — verified at sf0.1), which is
  a corpus-sized broadcast build at scale. Contrast
  ``unigram_nll_scores``, where both join inputs are estimated huge
  and the planner already picks sort-merge, so AQE can be left to
  upgrade it.
- Out-of-vocabulary tokens contribute 0 (inner join drops them) —
  the add-alpha prior makes unseen-token likelihoods cancel in the
  ratio up to the class-total denominators; documents with NO
  in-vocabulary tokens produce no row (same convention as
  ``unigram_nll_scores``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_script_spark.operators.textstats import words

__all__ = ["nb_token_model", "nb_train_score"]


def nb_token_model(
    train: DataFrame, text_col: str, label: Column, alpha: float = 0.5
) -> DataFrame:
    """Fit the NB token table on ``train``: (token, llr_q) where
    llr_q = round(1e6 * [ln((c1+a)/(n1+aV)) - ln((c0+a)/(n0+aV))]),
    c1/c0 = token occurrences under positive/negative ``label``,
    n1/n0 = class occurrence totals, V = vocabulary size. One explode
    + one aggregation; the scalar totals ride a broadcast cross join."""
    toks = train.select(
        label.alias("__y"),
        F.explode(F.filter(words(F.col(text_col)), lambda w: w != "")).alias(
            "token"
        ),
    )
    vocab = toks.groupBy("token").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).alias("c0"),
    )
    stats = vocab.agg(
        F.sum("c1").alias("n1"),
        F.sum("c0").alias("n0"),
        F.count(F.lit(1)).alias("v"),
    )
    a = float(alpha)
    llr_q = F.round(
        (
            F.log((F.col("c1") + F.lit(a)) / (F.col("n1") + F.lit(a) * F.col("v")))
            - F.log((F.col("c0") + F.lit(a)) / (F.col("n0") + F.lit(a) * F.col("v")))
        )
        * 1e6
    ).cast("long")
    return vocab.crossJoin(F.broadcast(stats)).select("token", llr_q.alias("llr_q"))


def nb_train_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    train_pred: Column,
    alpha: float = 0.5,
) -> DataFrame:
    """Train on the ``train_pred`` subset of ``df``, score the rest.

    The class prior enters as prior_q = round(1e6 * ln((d1+a)/(d0+a)))
    over train DOCUMENT counts. Returns one row per held-out document
    with >= 1 in-vocabulary token: (id_col, n_tokens, score_q,
    predicted) where score_q = prior_q + Σ llr_q and predicted is
    score_q > 0."""
    marked = df.select(
        F.col(id_col),
        F.col(text_col),
        label.alias("__y"),
        train_pred.alias("__tr"),
    )
    model = nb_token_model(
        marked.filter(F.col("__tr")), text_col, F.col("__y"), alpha
    )
    a = float(alpha)
    prior = (
        marked.filter(F.col("__tr"))
        .agg(
            F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("d1"),
            F.sum(F.when(F.col("__y"), 0).otherwise(1)).alias("d0"),
        )
        .select(
            F.round(
                (
                    F.log(F.col("d1") + F.lit(a))
                    - F.log(F.col("d0") + F.lit(a))
                )
                * 1e6
            )
            .cast("long")
            .alias("prior_q")
        )
    )
    toks = marked.filter(~F.col("__tr")).select(
        F.col(id_col),
        F.explode(F.filter(words(F.col(text_col)), lambda w: w != "")).alias(
            "token"
        ),
    )
    # The score join is pinned MERGE: the static planner estimates the
    # held-out token explode through the md5-split Filter as tiny and
    # broadcasts it (verified at sf0.1) — a corpus-sized broadcast
    # build at scale, the same class as bm25's dl join. With the hint
    # both sides shuffle by token; the model side is Zipf-small but
    # only AT RUNTIME, which a hard broadcast decision must not
    # depend on.
    summed = (
        toks.join(model.hint("merge"), "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("llr_q").alias("__s"),
        )
    )
    return summed.crossJoin(F.broadcast(prior)).select(
        F.col(id_col),
        "n_tokens",
        (F.col("prior_q") + F.col("__s")).alias("score_q"),
        ((F.col("prior_q") + F.col("__s")) > 0).alias("predicted"),
    )
