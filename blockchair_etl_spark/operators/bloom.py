"""Explicit bloom-filter join pruning — the semi-join reduction that
ships a compact bitset instead of the key set.

Spark's AQE already injects runtime bloom filters into shuffle joins
(`spark.sql.optimizer.runtime.bloomFilter.*`); this is the explicit,
deterministic form for when the pruning must be portable or reusable —
e.g. persisting one day's dimension-key bloom and pruning every later
fact scan against it, or pushing the same bitset into a non-Spark
reader. Hashes are the same portable integer family as the count-min
sketch (`operators/approx.CMS_PARAMS` style): pure int64 arithmetic,
identical across engines.

Correctness contract: a bloom filter has NO false negatives, so
`bloom_pruned_join` returns exactly the rows of the plain join — the
bitset only reduces the rows that reach the shuffle. False positives
cost shuffle volume, not correctness; with k=4 hashes and m bits the
fp rate is ~(1 - e^{-kn/m})^k.

Scale shape: the build is one map-side explode + one ``m/64``-row
bit_or aggregate (the bitset, never the key set, reaches the driver —
1 KiB at the 8192-bit default); the probe is a codegen'd bitwise
filter on the fact scan, upstream of any shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BLOOM_PRIME = 1_000_000_007
BLOOM_PARAMS: tuple[tuple[int, int], ...] = (
    (3, 17),
    (1_299_709, 104_729),
    (15_485_863, 32_452_843),
    (49_979_687, 86_028_121),
)


def _pos_sql(key_col: str, a: int, b: int, m_bits: int) -> str:
    # pmod keeps every position in [0, m_bits) for NEGATIVE keys too —
    # plain % follows the dividend's sign, and a negative position would
    # corrupt the build (Python negative list index wraps to the end)
    # while the probe's element_at(pos div 64 + 1) errors or reads a
    # different word: silent false negatives. pmod(a*pmod(k,p)+b, p)
    # never overflows int64 (a < 5e7, pmod < 1e9).
    p = BLOOM_PRIME
    return (
        f"pmod(pmod({a} * pmod(CAST({key_col} AS BIGINT), {p}) + {b}, {p}),"
        f" {m_bits})"
    )


def bloom_build(dim: DataFrame, key_col: str, m_bits: int = 8192) -> list[int]:
    """Bitset of the dimension's keys as ``m_bits // 64`` int64 words
    (dense list, zero words included)."""
    positions = dim.select(
        F.explode(
            F.array(
                *[F.expr(_pos_sql(key_col, a, b, m_bits)) for a, b in BLOOM_PARAMS]
            )
        ).alias("pos")
    )
    words = (
        positions.select(
            F.expr("pos div 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r.word_idx] = r.word
    return dense


def bloom_might_contain(
    key_col: str, words: list[int], m_bits: int = 8192
) -> Column:
    """Probe predicate over the named key column: true iff every hash
    position's bit is set. Pure bitwise expression — codegen'd,
    pushable upstream of the join shuffle."""
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])
    cond = F.lit(True)
    for a, b in BLOOM_PARAMS:
        pos = _pos_sql(key_col, a, b, m_bits)
        word = F.element_at(arr, F.expr(f"CAST(({pos}) div 64 AS INT)") + F.lit(1))
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(({pos}) % 64 AS INT))")
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


_BLOOM_SAFE_JOINS = frozenset({"inner", "semi", "leftsemi", "left_semi"})


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 8192,
    how: str = "inner",
) -> DataFrame:
    """Plain equi-join result, with the fact side pre-filtered through
    the dimension-key bloom before it reaches the shuffle.

    Only join types for which dropping non-matching FACT rows is
    semantics-preserving are accepted (inner / left_semi). For left
    joins the bloom would drop fact rows that must appear with null dim
    columns, and for anti joins it would remove exactly the rows the
    join must return — those types raise rather than silently corrupt.
    """
    norm = how.replace("_", "").lower()
    if norm not in {h.replace("_", "") for h in _BLOOM_SAFE_JOINS}:
        raise ValueError(
            f"bloom_pruned_join: how={how!r} is not semantics-preserving "
            "under fact-side pre-filtering; use 'inner' or 'left_semi' "
            "(outer/anti joins must see the unfiltered fact side)"
        )
    words = bloom_build(dim, dim_key, m_bits)
    pruned = fact.filter(bloom_might_contain(fact_key, words, m_bits))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
