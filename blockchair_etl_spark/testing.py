"""Local oracle-parity harness mirroring the verification driver's gate.

The driver runs each `queries()[name]` on Spark and the matching
`oracle_sql()[name]` on DuckDB over the same parquet tables, then
compares row count + schema + order-insensitive value hash. This module
reproduces that comparison so parity regressions surface in `pytest`
before a round ends.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from .io.sources import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            s = s.astype(float)
        elif s.dtype == object:
            def _norm_obj(v):
                if hasattr(v, "as_tuple"):  # Decimal
                    return float(v)
                if hasattr(v, "isoformat"):  # date / datetime objects
                    return str(v)
                return v

            s = s.map(_norm_obj)
        out[c] = s
    norm = pd.DataFrame(out)
    if len(norm):
        norm = norm.sort_values(by=list(norm.columns), kind="mergesort").reset_index(
            drop=True
        )
    return norm


@dataclass
class ParityResult:
    name: str
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    exact_match: bool
    max_float_diff: float = 0.0
    mismatches: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.columns_match
            and self.exact_match
        )


def compare_frames(
    name: str,
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    float_tol: float = 0.0,
) -> ParityResult:
    """Driver-style comparison. ``float_tol`` (absolute) is 0 for the
    driver-gate mirror (bit-exact); engine-internal tests of float
    pipelines (e.g. running sums of doubles, where summation order is
    legitimately unspecified) pass a small tolerance."""
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    res = ParityResult(
        name=name,
        spark_rows=len(a),
        oracle_rows=len(b),
        columns_match=list(a.columns) == list(b.columns),
        exact_match=False,
    )
    if not res.columns_match:
        res.mismatches.append(f"columns: spark={list(a.columns)} oracle={list(b.columns)}")
        return res
    if len(a) != len(b):
        res.mismatches.append(f"row count: spark={len(a)} oracle={len(b)}")
        return res
    exact = True
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av_f = av.astype(float).to_numpy()
            bv_f = bv.astype(float).to_numpy()
            both_nan = pd.isna(av_f) & pd.isna(bv_f)
            diff = abs(av_f - bv_f)
            diff[both_nan] = 0.0
            mx = float(max(diff)) if len(diff) else 0.0
            res.max_float_diff = max(res.max_float_diff, 0.0 if math.isnan(mx) else mx)
            if not ((diff <= float_tol) | both_nan).all():
                exact = False
                res.mismatches.append(f"column {c}: max abs diff {mx}")
        else:
            neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
            if neq.any():
                exact = False
                i = int(neq.idxmax())
                res.mismatches.append(
                    f"column {c}: {int(neq.sum())} diffs, first at row {i}: "
                    f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                )
    res.exact_match = exact
    return res


def check_query(spark, sf_dir: str, name: str, con=None) -> ParityResult:
    from .queryset import QUERIES

    spec = QUERIES[name]
    try:
        sdf = spec.fn(spark, sf_dir).toPandas()
    finally:
        # Release plan-level persists (caching.py) now that the result
        # is materialized: a full parity sweep must leave zero cached
        # blocks behind.
        from .caching import release_tracked

        release_tracked()
    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        if spec.oracle is None:
            return ParityResult(
                name=name,
                spark_rows=len(sdf),
                oracle_rows=len(sdf),
                columns_match=True,
                exact_match=True,
            )
        odf = con.execute(spec.oracle).fetchdf()
    finally:
        if own_con:
            con.close()
    return compare_frames(name, sdf, odf)


def zipfian_corpus(spark, n_docs: int = 20_000, vocab: int = 50_000, dup_frac: float = 0.1):
    """Deterministic Zipf-vocabulary document corpus for dedup benching.

    The driver's synthetic `documents` table has a 31-term vocabulary in
    which every term is near-universal, so any term-keyed candidate
    generation degenerates to all-pairs (sum df^2 ≈ n²/|V|). Real
    corpora are Zipfian: a few stopword-frequency terms plus a long
    rare-term tail, which is exactly the regime where a df-bounded
    candidate path (``bow_cosine_pairs(max_df=...)``) prunes. This
    builds such a corpus from pure Spark expressions — xxhash64-derived
    uniforms pushed through the Zipf(s=1) inverse CDF — so it is
    bit-deterministic across runs, sessions, and partitionings, with no
    files and no driver-side RNG.

    The last ``dup_frac`` of docs are near-duplicates of their base doc
    (same token stream, one token appended), so the fixture contains
    genuine near-dup pairs to find.

    Columns: doc_id BIGINT, text STRING.
    """
    from pyspark.sql import functions as F

    n_base = int(n_docs * (1.0 - dup_frac))
    # tokens per doc: 40 + (h % 41) in [40, 80]
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_base, F.col("id"))
        .otherwise(F.col("id") - n_base)
        .alias("seed_id"),
        (F.col("id") >= n_base).alias("is_dup"),
    )
    # u_j = uniform in (0,1] from xxhash64(seed_id, j); rank = floor(V^u)
    # has P(rank=r) ∝ 1/r (Zipf s=1 over ranks 1..V).
    toks = (
        f"transform(sequence(1, 40 + pmod(xxhash64(seed_id), 41)), "
        f"j -> concat('t', cast(floor(pow({vocab}, "
        f"(pmod(xxhash64(seed_id, j), 1000000) + 1) / 1000000.0)) as bigint)))"
    )
    return base.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.expr(toks),
            F.when(F.col("is_dup"), F.concat(F.lit("t"), F.col("doc_id"))).otherwise(
                F.lit(None)
            ),
        ).alias("text"),
    )
