"""Learned quality classifier for corpus filtering (fastText-recipe).

The heuristic gates in ``corpus.quality_filter`` (C4/Gopher rules) are
interpretable but blunt; production corpus builds (the CCNet/LLaMA
recipe) train a LINEAR text classifier — positives from a trusted
corpus, negatives from raw crawl — and filter on its probability.  This
module is that step on Spark:

- ``weak_labels`` — bootstrap labels without human annotation: the
  heuristic quality score's confident tails become positives/negatives,
  the ambiguous middle is dropped (standard weak-supervision practice;
  callers with a real trusted corpus pass their own labels instead).
- ``train_quality_classifier`` — hashed bag-of-words → logistic
  regression via ``pyspark.ml`` (distributed L-BFGS: gradient is a
  tree-aggregated sum over partitions — the textbook data-parallel
  fit).  Feature hashing keeps the model a fixed-size dense vector
  (``2^18`` doubles ≈ 2 MB) with no vocabulary to build, ship, or
  desync.
- ``score_quality`` — the fitted model broadcasts to executors; scoring
  is one map-side pass, no shuffle (plan-assertable), emitting
  ``quality_prob``.

Scale: training input is usually a SAMPLE (a few million docs bound the
fit regardless of corpus size — document-count, not token-count,
drives LR convergence); scoring is corpus-sized but embarrassingly
parallel.  The model object is driver-held like any coefficients
vector; nothing corpus-sized ever collects.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from verified_sources_spark.functions.text import quality_score, tokens


def weak_labels(
    df: DataFrame,
    text_col: str,
    pos_min: float = 0.6,
    neg_max: float = 0.3,
    label_col: str = "label",
) -> DataFrame:
    """Label the heuristic score's confident tails (>= pos_min → 1.0,
    <= neg_max → 0.0) and DROP the ambiguous middle — training on
    uncertain labels teaches the model the heuristic's noise."""
    if not neg_max < pos_min:
        raise ValueError("neg_max must be < pos_min")
    q = quality_score(F.col(text_col))
    return df.withColumn(
        label_col,
        F.when(q >= pos_min, F.lit(1.0)).when(q <= neg_max, F.lit(0.0)),
    ).filter(F.col(label_col).isNotNull())


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str = "label",
    num_features: int = 2**18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
):
    """Fit hashed-BoW logistic regression; returns a PipelineModel whose
    ``transform`` adds probability/prediction columns.

    Import-gated like every optional integration: raises ImportError with
    guidance if pyspark.ml is unavailable (it ships with pyspark)."""
    try:
        from pyspark.ml import Pipeline
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import HashingTF
    except ImportError as e:  # pragma: no cover - ml ships with pyspark
        raise ImportError("pyspark.ml is required for the quality classifier") from e

    prepped = df.withColumn("_toks", tokens(F.col(text_col)))
    tf = HashingTF(
        inputCol="_toks", outputCol="_features", numFeatures=int(num_features)
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=int(max_iter),
        regParam=float(reg_param),
        standardization=False,
    )
    return Pipeline(stages=[tf, lr]).fit(prepped)


def score_quality(
    model,
    df: DataFrame,
    text_col: str,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append ``out_col`` = P(high quality).  Map-side only: the model's
    coefficient vector rides the closure; no shuffle, no collect."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df.withColumn("_toks", tokens(F.col(text_col))))
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability"))[1]
    ).drop("_toks", "_features", "rawPrediction", "probability", "prediction")


def quality_filter_learned(
    model,
    df: DataFrame,
    text_col: str,
    min_prob: float = 0.5,
) -> DataFrame:
    """Keep rows the learned classifier scores at or above ``min_prob``
    (the CCNet-style corpus gate, learned flavor)."""
    return (
        score_quality(model, df, text_col)
        .filter(F.col("quality_prob") >= float(min_prob))
        .drop("quality_prob")
    )
