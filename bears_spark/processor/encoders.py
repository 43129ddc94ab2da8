"""Supervised categorical encoders, Spark-first: leakage-safe K-fold target
(mean) encoding and weight-of-evidence (WoE) / information-value scoring.

The reference's encoding surface is unsupervised only (LabelEncoding,
src/bears/processor/CategoricalMissingValueImputation.py ff.); supervised
encoders are a core tabular-ML-pipeline op, so they join the processor
family as beyond-reference members, same contract: pure DataFrame plans,
one partial-aggregated shuffle at category grain, no fit-state wider than
(n_categories x n_folds) rows.

Scale shape (100 TB): both encoders reduce the fact table ONCE to
(category[, fold]) grain — a map-side-combinable groupBy — then do all the
arithmetic on that bounded aggregate. The encoded-value table is
dimension-sized; applying it back to rows is a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode_kfold(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    fold_col: str,
    smoothing: float = 20.0,
) -> DataFrame:
    """Out-of-fold mean-target encoding with additive smoothing.

    For each (category, fold), the encoded value is built ONLY from rows
    outside that fold (leakage-safe: a row never sees its own target):

        enc = (oof_sum + m * oof_prior) / (oof_n + m)

    where oof_sum / oof_n are the category's target sum/count excluding the
    fold, oof_prior is the GLOBAL out-of-fold mean (all categories,
    excluding the fold's rows... of this category only — see below), and
    m = ``smoothing`` pulls rare categories toward the prior.

    ``fold_col`` must be a deterministic integer fold id the caller derives
    from a stable key (e.g. ``pmod(order_id, k)`` — same recipe as
    stream.py's sharding), NOT a random split: determinism is what makes
    the encoding reproducible across retrains and testable against a SQL
    oracle.

    The prior for (category c, fold f) excludes exactly the rows of
    (c, f): global_sum - sum(c, f) over global_n - n(c, f). Excluding all
    of fold f globally would also be defensible; this variant keeps the
    prior usable when folds are imbalanced across categories and matches
    the common "subtract self" formulation.

    Returns one row per (category, fold): (cat, fold, enc, n_rows).
    """
    g = df.groupBy(F.col(cat_col).alias("cat"), F.col(fold_col).alias("fold")).agg(
        F.sum(target_col).alias("sy"), F.count(target_col).alias("n")
    )
    w_cat = Window.partitionBy("cat")
    w_all = Window.partitionBy()
    # both windows sit on the (cat, fold) aggregate — bounded rows
    enc = (
        g.withColumn("oof_sum", F.sum("sy").over(w_cat) - F.col("sy"))
        .withColumn("oof_n", F.sum("n").over(w_cat) - F.col("n"))
        .withColumn("gl_sum", F.sum("sy").over(w_all) - F.col("sy"))
        .withColumn("gl_n", F.sum("n").over(w_all) - F.col("n"))
        .withColumn(
            "enc",
            (F.col("oof_sum") + F.lit(smoothing) * (F.col("gl_sum") / F.col("gl_n")))
            / (F.col("oof_n") + F.lit(smoothing)),
        )
    )
    return enc.select("cat", "fold", "enc", F.col("n").alias("n_rows"))


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Weight of evidence per category of a binary label, with the additive
    (Laplace) correction ``alpha`` so empty cells stay finite:

        woe(c) = ln( ((pos_c + a) / (pos + a)) / ((neg_c + a) / (neg + a)) )

    plus the category's information-value term
    ``iv_term = (p_pos - p_neg) * woe`` (sum over categories = the
    feature's IV). ``label_col`` must be 0/1 (cast upstream).

    One groupBy at category grain; the totals come back via an
    unpartitioned window over the bounded category aggregate.
    """
    g = df.groupBy(F.col(cat_col).alias("cat")).agg(
        F.sum(label_col).alias("np"),
        (F.count(label_col) - F.sum(label_col)).alias("nn"),
    )
    w = Window.partitionBy()
    a = F.lit(float(alpha))
    p_pos = (F.col("np") + a) / (F.sum("np").over(w) + a)
    p_neg = (F.col("nn") + a) / (F.sum("nn").over(w) + a)
    return (
        g.withColumn("woe", F.log(p_pos / p_neg))
        .withColumn("iv_term", (p_pos - p_neg) * F.log(p_pos / p_neg))
        .select("cat", "np", "nn", "woe", "iv_term")
    )
