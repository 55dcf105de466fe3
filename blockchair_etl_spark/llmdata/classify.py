"""Model-based quality filtering: hashed linear-classifier inference.

The shape every modern pretraining pipeline has in front of the
tokenizer — a trained linear model over hashed bag-of-words features
(fastText in CCNet/LLaMA data prep, the FineWeb-Edu / DCLM quality
classifiers) applied to every document in the corpus. Training happens
offline on a small labeled set; the corpus-scale job is INFERENCE, and
that is what this module expresses relationally:

    score(doc) = bias + Σ_{token occurrences} w[feat(token)]

with ``feat`` a stable hash into a fixed feature space and ``w`` the
model's weight vector — a tiny relation (``n_features`` rows) that
broadcasts to every executor, exactly how a served model artifact
rides along a 1000-executor scan.

Engine-portability contract (same rules as sampling.dsir_proxy_scores):
- feature ids come from md5 hex nibbles (bit-identical in any engine
  with md5), never an engine-private hash;
- weights and scores are exact BIGINTs — the sigmoid is monotone, so
  thresholding on the integer logit is equivalent to thresholding on
  the probability, and exp() is not bit-portable;
- per-doc accumulation is one hash aggregate, no windows, no Python.

Scale shape: tokens explode once; md5 runs once per DISTINCT token
(the stream joins the distinct-token featurization back, the same
trick dsir_proxy_scores and shuffle_shards use); the weight relation
is O(n_features) and broadcast; the per-doc sum is one map-side
combinable aggregate. Reference parity: the reference engine has no
model-inference operator — this extends SURVEY.md §2's LLM-data
surface (quality scoring family, text.py:quality_scores being the
heuristic sibling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_HEXD = "0123456789abcdef"


def _nibble(expr: str, pos: int) -> str:
    """SQL for the value of hex-digit ``pos`` (1-based) of ``expr``."""
    return f"(instr('{_HEXD}', substring({expr}, {pos}, 1)) - 1)"


def feature_id_col(token: str, n_features: int) -> Column:
    """Stable hashed feature id in [0, n_features): the first four md5
    hex nibbles (16 bits) of the token, reduced mod n_features. Four
    nibbles keep the pre-mod space (65536) comfortably above any
    practical linear-model feature count while staying cheap. Built as
    one SQL expression over the column NAME so the Spark and DuckDB
    forms are the same text (instr/substring/md5 exist in both)."""
    md5e = f"md5({token})"
    expr = (
        f"CAST((({_nibble(md5e, 1)} * 4096 + {_nibble(md5e, 2)} * 256 "
        f"+ {_nibble(md5e, 3)} * 16 + {_nibble(md5e, 4)}) % {n_features}) AS BIGINT)"
    )
    return F.expr(expr)


def hashed_weights(
    spark: SparkSession, n_features: int = 4096, scale: int = 1024, seed: str = "w1"
) -> DataFrame:
    """Deterministic stand-in for a trained weight artifact:
    ``w_q(f) = md5_16bits(seed|f) % (2*scale+1) - scale`` — integer
    weights in [-scale, +scale], identical in any md5-capable engine.

    Production swaps this for ``spark.read.parquet(model_path)`` (the
    real trained weights); the stand-in exists so the inference path
    itself is oracle-checkable end to end without a model file."""
    md5e = f"md5(concat('{seed}|', CAST(id AS STRING)))"
    w_q = (
        f"CAST((({_nibble(md5e, 1)} * 4096 + {_nibble(md5e, 2)} * 256 "
        f"+ {_nibble(md5e, 3)} * 16 + {_nibble(md5e, 4)}) % {2 * scale + 1}) "
        f"- {scale} AS BIGINT)"
    )
    return spark.range(n_features).select(
        F.col("id").cast("bigint").alias("feature"), F.expr(w_q).alias("w_q")
    )


def linear_classifier_scores(
    df: DataFrame,
    weights: DataFrame,
    n_features: int = 4096,
    bias_q: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document with a hashed linear classifier.

    ``weights``: (feature BIGINT, w_q BIGINT) — the model artifact.
    Broadcast unconditionally: a linear model over a hashed feature
    space is O(n_features) rows by construction, never data-sized.

    Output: (id, n_tokens, logit_q, pred) — one row per doc with ≥1
    token. ``logit_q = bias_q + Σ w_q[feat(token)]`` over token
    OCCURRENCES (an n-occurrence token contributes n times, the
    bag-of-words convention); ``pred = logit_q >= 0`` as INT. Docs
    whose every token hashes to absent weight rows keep logit_q =
    bias_q via the left join's null-sum → 0 coalesce.
    """
    from .text import tokens_col

    toks = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("token")
    )
    # md5 per OCCURRENCE, map-side. The previous shape hashed once per
    # DISTINCT token and joined the featurization back onto the
    # occurrence stream — but that costs two shuffles of the
    # corpus-sized occurrence relation (the distinct and, once the
    # vocabulary outgrows the broadcast threshold, the join-back)
    # to save a ~100 ns hash whose cost is noise next to a shuffle
    # row. Measured r17 (isolated 7-run medians, both orders, sf0.1):
    # 1.35-1.42 s joined vs 0.66-0.72 s direct, outputs identical;
    # at 100 TB the direct form keeps the pre-aggregation pipeline
    # shuffle-free (guide §2.3: aggregate before you shuffle).
    occ = toks.select(
        F.col(id_col), feature_id_col("token", n_features).alias("feature")
    )
    scored = occ.join(F.broadcast(weights), "feature", "left")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            (F.coalesce(F.sum("w_q"), F.lit(0)) + F.lit(bias_q))
            .cast("bigint")
            .alias("logit_q"),
        )
        .withColumn("pred", (F.col("logit_q") >= 0).cast("int"))
    )
