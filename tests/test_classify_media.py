"""Behavioral coverage for llmdata.classify (hashed linear-classifier
inference) and dedup.media_byte_fingerprints (byte-gram SimHash for
opaque media payloads) — ADVICE r7 #1: both shipped in r7 with no
tests; expected values here are hand-computed in Python from the same
md5 contracts the operators promise."""

import hashlib
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from blockchair_etl_spark.llmdata.classify import (
    feature_id_col,
    hashed_weights,
    linear_classifier_scores,
)
from blockchair_etl_spark.llmdata.dedup import media_byte_fingerprints


def _feat(token: str, n_features: int) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:4], 16) % n_features


def _wq(feature: int, scale: int, seed: str = "w1") -> int:
    h = int(hashlib.md5(f"{seed}|{feature}".encode()).hexdigest()[:4], 16)
    return h % (2 * scale + 1) - scale


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_hashed_weights_range_and_determinism(spark):
    w = hashed_weights(spark, n_features=128, scale=10, seed="w1")
    rows = {r.feature: r.w_q for r in w.collect()}
    assert len(rows) == 128
    assert set(rows) == set(range(128))
    assert all(-10 <= v <= 10 for v in rows.values())
    for f in (0, 7, 127):
        assert rows[f] == _wq(f, 10)
    again = {r.feature: r.w_q for r in hashed_weights(spark, 128, 10, "w1").collect()}
    assert again == rows


def test_feature_id_col_matches_python_md5(spark):
    toks = ["alpha", "beta", "x9", "the"]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {
        r.token: r.feature
        for r in df.select("token", feature_id_col("token", 64).alias("feature")).collect()
    }
    assert got == {t: _feat(t, 64) for t in toks}


def test_linear_classifier_scores_hand_computed(spark):
    docs = [
        (1, "alpha beta alpha"),  # repeated token counts twice
        (2, "Gamma, BETA!"),  # case/punct normalization
        (3, ""),  # no tokens -> no output row
        (4, "zzz"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    w = hashed_weights(spark, n_features=64, scale=10, seed="w1")
    out = {
        r.doc_id: (r.n_tokens, r.logit_q, r.pred)
        for r in linear_classifier_scores(
            df, w, n_features=64, bias_q=3
        ).collect()
    }
    exp = {}
    for did, text in docs:
        toks = _toks(text)
        if not toks:
            continue
        logit = 3 + sum(_wq(_feat(t, 64), 10) for t in toks)
        exp[did] = (len(toks), logit, int(logit >= 0))
    assert 3 not in out
    assert out == exp and len(out) == 3


def test_linear_classifier_absent_weight_rows_keep_bias(spark):
    """A doc whose every token hashes to a feature with no weight row
    (a sparse trained model) must keep logit_q = bias_q, not null."""
    df = spark.createDataFrame([(1, "alpha alpha")], "doc_id bigint, text string")
    f_alpha = _feat("alpha", 64)
    w = hashed_weights(spark, n_features=64, scale=10).filter(
        F.col("feature") != f_alpha
    )
    row = linear_classifier_scores(df, w, n_features=64, bias_q=-7).collect()[0]
    assert (row.n_tokens, row.logit_q, row.pred) == (2, -7, 0)


def _py_media_simhash(content: bytes, bits: int = 32, gram_bytes: int = 4) -> int | None:
    width = gram_bytes * 2
    hx = content.hex()
    if len(hx) < width:
        return None
    grams = [hx[i : i + width] for i in range(0, len(hx) - width + 1, 2)]
    acc = [0] * bits
    for g, wgt in Counter(grams).items():
        hexd = hashlib.md5(g.encode()).hexdigest()
        for j in range(bits):
            nib = int(hexd[j // 4], 16)
            if (nib >> (j % 4)) & 1:
                acc[j] += wgt
            else:
                acc[j] -= wgt
    return sum(1 << j for j in range(bits) if acc[j] >= 0)


def test_media_byte_fingerprints_hand_computed(spark):
    payloads = [
        (1, b"abcdefghij" * 3),
        (2, b"abc"),  # shorter than gram_bytes=4 -> no row
        (3, b""),  # empty -> no row
        (4, b"\x00\x01\x02\x03\x04"),
    ]
    df = spark.createDataFrame(payloads, "media_id bigint, content binary")
    got = {
        r.doc: r.simhash
        for r in media_byte_fingerprints(df, bits=32, gram_bytes=4).collect()
    }
    exp = {
        mid: _py_media_simhash(c)
        for mid, c in payloads
        if _py_media_simhash(c) is not None
    }
    assert got == exp
    assert 2 not in got and 3 not in got


def test_media_byte_fingerprints_near_dup_locality(spark):
    """Payloads sharing most byte grams (one byte flipped mid-stream)
    must land within small Hamming distance; unrelated payloads far."""
    base = bytes(range(64)) * 4
    near = bytearray(base)
    near[100] ^= 0xFF
    other = hashlib.sha256(b"unrelated").digest() * 8
    df = spark.createDataFrame(
        [(1, base), (2, bytes(near)), (3, other)],
        "media_id bigint, content binary",
    )
    fp = {r.doc: r.simhash for r in media_byte_fingerprints(df).collect()}
    hd_near = bin(fp[1] ^ fp[2]).count("1")
    hd_far = bin(fp[1] ^ fp[3]).count("1")
    assert hd_near <= 6, hd_near
    assert hd_far > hd_near, (hd_far, hd_near)


def test_fanout_parallel_skips_when_wide_enough(spark):
    """The pre-explode repartition must be a no-op when the input is
    already at cluster parallelism (the many-files-at-scale case) and
    widen a narrow input (the one-file bench/ingest case)."""
    from blockchair_etl_spark.llmdata.dedup import _fanout_parallel

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    assert _fanout_parallel(narrow).rdd.getNumPartitions() >= par
    wide = spark.range(1000).repartition(par + 4)
    assert _fanout_parallel(wide) is wide
