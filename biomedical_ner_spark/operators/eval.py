"""Evaluation operators (SURVEY.md A10-A12, J5).

The reference evaluates (prediction, target) pairs positionally
(JNLPBA.ipynb cc[5] calculate_metrics, cc[13] predict_on_test_set,
cc[15]/cc[61] accuracy).  Here targets are the lexicon tags and a
deterministic perturbation produces "predictions" so the metric operators
are exercised end-to-end and oracle-checkable: pred = 'O' where
(doc_id + pos) % 7 == 0, else the target tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_synthetic_predictions(tags_df: DataFrame) -> DataFrame:
    """(doc_id, pos, token, target, pred) from lexicon tags + deterministic
    degradation (engine-portable: pure modular arithmetic)."""
    return tags_df.select(
        "doc_id", "pos", "token",
        F.col("tag").alias("target"),
        F.when((F.col("doc_id") + F.col("pos")) % 7 == 0, F.lit("O"))
        .otherwise(F.col("tag"))
        .alias("pred"),
    )


def eval_join(preds: DataFrame, targets: DataFrame) -> DataFrame:
    """J5: positional equi-join of two prediction sets on (doc_id, pos) —
    the distributed form of the reference's zip(predictions, targets)."""
    p = preds.select("doc_id", "pos", F.col("pred").alias("pred"))
    t = targets.select("doc_id", "pos", F.col("target").alias("target"))
    return p.join(t, ["doc_id", "pos"])


def confusion_matrix(pairs: DataFrame) -> DataFrame:
    """A10 — (target, pred, n) cells + row-normalized fraction
    (JNLPBA.ipynb cc[13]); long form rather than pivot so the schema is
    stable for the oracle."""
    cells = pairs.groupBy("target", "pred").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("target")
    return cells.withColumn(
        "frac", F.round(F.col("n") / F.sum("n").over(w), 6)
    )


def token_accuracy(pairs: DataFrame) -> DataFrame:
    """A12 — token accuracy over all pairs (JNLPBA.ipynb cc[61])."""
    return pairs.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("pred") == F.col("target"), 1).otherwise(0))
        .alias("n_correct"),
        F.round(
            F.avg(F.when(F.col("pred") == F.col("target"), 1.0).otherwise(0.0)),
            6,
        ).alias("accuracy"),
    )


def macro_prf(pairs: DataFrame) -> DataFrame:
    """A11 — macro precision/recall/F1 with O/O pairs excluded
    (JNLPBA.ipynb cc[5] calculate_metrics semantics: keep pairs where
    target!='O' OR pred!='O'; per-class P/R/F1 over the target/pred class
    axes; macro = unweighted mean over classes present)."""
    kept = pairs.where((F.col("target") != "O") | (F.col("pred") != "O"))
    classes = (
        kept.select(F.col("target").alias("cls"))
        .union(kept.select(F.col("pred").alias("cls")))
        .distinct()
    )
    stats = classes.join(
        kept.groupBy(F.col("target").alias("cls")).agg(
            F.sum(F.when(F.col("pred") == F.col("target"), 1).otherwise(0))
            .alias("tp_t"),
            F.count(F.lit(1)).alias("support"),
        ),
        "cls", "left",
    ).join(
        kept.groupBy(F.col("pred").alias("cls")).agg(
            F.count(F.lit(1)).alias("pred_n"),
        ),
        "cls", "left",
    )
    per_class = stats.select(
        "cls",
        F.coalesce("tp_t", F.lit(0)).alias("tp"),
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("pred_n", F.lit(0)).alias("pred_n"),
    ).select(
        "cls", "support",
        F.when(F.col("pred_n") > 0, F.col("tp") / F.col("pred_n"))
        .otherwise(F.lit(0.0)).alias("precision"),
        F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
        .otherwise(F.lit(0.0)).alias("recall"),
    ).select(
        "cls", "support", "precision", "recall",
        F.when(
            (F.col("precision") + F.col("recall")) > 0,
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)).alias("f1"),
    )
    return per_class.agg(
        F.round(F.avg("precision"), 6).alias("macro_precision"),
        F.round(F.avg("recall"), 6).alias("macro_recall"),
        F.round(F.avg("f1"), 6).alias("macro_f1"),
        F.count(F.lit(1)).alias("n_classes"),
    )


def per_class_report(pairs: DataFrame) -> DataFrame:
    """Per-class precision/recall/F1/support (classification_report twin,
    JNLPBA.ipynb cc[13]) — rounded for oracle hashing."""
    kept = pairs.where((F.col("target") != "O") | (F.col("pred") != "O"))
    t = kept.groupBy(F.col("target").alias("cls")).agg(
        F.sum(F.when(F.col("pred") == F.col("target"), 1).otherwise(0))
        .alias("tp"),
        F.count(F.lit(1)).alias("support"),
    )
    p = kept.groupBy(F.col("pred").alias("cls")).agg(
        F.count(F.lit(1)).alias("pred_n")
    )
    j = t.join(p, "cls", "full").na.fill(
        {"tp": 0, "support": 0, "pred_n": 0}
    )
    return j.select(
        "cls", "support",
        F.round(
            F.when(F.col("pred_n") > 0, F.col("tp") / F.col("pred_n"))
            .otherwise(F.lit(0.0)), 6,
        ).alias("precision"),
        F.round(
            F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
            .otherwise(F.lit(0.0)), 6,
        ).alias("recall"),
    )
