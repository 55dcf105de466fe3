"""Deterministic hash-based sampling and dataset splitting.

Sampling a 100 TB corpus must be (a) reproducible — task retries and
re-runs must select the SAME rows, which `rand()`-based sampling does
not guarantee (recomputed partitions re-draw); (b) seedable — a new
`salt` draws an independent sample; (c) portable — the same rows come
out of any engine, so splits can be produced once and re-derived
anywhere. Hash-prefix thresholds on a stable key give all three: a row
is selected iff a hex prefix of ``md5(key || salt)`` falls below a
threshold. Everything is a scan-side Column expression — no shuffle,
no state, embarrassingly parallel.

Hex-prefix comparison is equivalent to a numeric threshold on the hash
value (fixed-width hex is lexicographically monotone), which keeps the
predicate engine-portable without hex→integer conversion builtins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .stats import CorpusStats


def hash_key_col(id_col: Column | str, salt: str = "") -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = c.cast("string")
    if salt:
        key = F.concat(key, F.lit(salt))
    return F.md5(key)


def hash_sample(
    df: DataFrame,
    id_col: str,
    prefix_lt: str = "1a",
    n_chars: int = 2,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose hash prefix sorts below ``prefix_lt``.

    Sampling fraction ≈ int(prefix_lt, 16) / 16**n_chars (e.g. the
    default '1a' over 2 chars ≈ 26/256 ≈ 10.2%). Deterministic in the
    id: the same rows survive every run, engine, and retry.
    """
    if len(prefix_lt) != n_chars:
        raise ValueError("prefix_lt must be exactly n_chars hex digits")
    prefix = F.substring(hash_key_col(id_col, salt), 1, n_chars)
    return df.filter(prefix < F.lit(prefix_lt.lower()))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    thresholds: dict[str, str],
    id_col: str,
    n_chars: int = 2,
    salt: str = "",
    default_lt: str = "00",
) -> DataFrame:
    """Deterministic stratified sampling: each stratum gets its own
    hash-prefix threshold (e.g. downsample dominant languages, keep all
    of the rare ones — the standard corpus-rebalancing move). Strata
    absent from ``thresholds`` fall to ``default_lt`` ('00' = drop).
    Same reproducibility contract as hash_sample: selection depends only
    on (id, salt), never on partitioning, retries, or engine."""
    for stratum, bound in thresholds.items():
        if len(bound) != n_chars:
            raise ValueError(f"threshold {bound!r} for {stratum!r} must be {n_chars} hex digits")
    prefix = F.substring(hash_key_col(id_col, salt), 1, n_chars)
    bound_expr = None
    for stratum, bound in thresholds.items():
        cond = F.col(strata_col) == stratum
        bound_expr = (
            F.when(cond, bound.lower())
            if bound_expr is None
            else bound_expr.when(cond, bound.lower())
        )
    bound_col = (
        bound_expr.otherwise(default_lt.lower()) if bound_expr is not None else F.lit(default_lt.lower())
    )
    return df.filter(prefix < bound_col)


def hash_split(
    df: DataFrame,
    id_col: str,
    boundaries: tuple[tuple[str, str], ...] = (("val", "0c"), ("test", "1a")),
    default_split: str = "train",
    n_chars: int = 2,
    salt: str = "",
) -> DataFrame:
    """df + a ``split`` column assigned by hash-prefix bands.

    ``boundaries`` are (name, upper_bound_hex) pairs in ascending order:
    the default puts ~4.7% in val (< '0c'), the next ~5.5% in test
    (< '1a'), the rest in train — the standard reproducible
    train/val/test split keyed on document identity, so re-ingesting a
    document can never migrate it across splits.
    """
    prefix = F.substring(hash_key_col(id_col, salt), 1, n_chars)
    expr = None
    for name, bound in boundaries:
        if len(bound) != n_chars:
            raise ValueError(f"boundary {bound!r} must be {n_chars} hex digits")
        cond = prefix < F.lit(bound.lower())
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = expr.otherwise(default_split) if expr is not None else F.lit(default_split)
    return df.withColumn("split", split)


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-group 'reservoir': rank rows inside each group
    by md5(id || salt) and keep the first k. Statistically equivalent to
    uniform reservoir sampling but reproducible across runs, retries,
    partitionings, and engines (unlike rand()-keyed reservoirs). One
    window shuffle on the group key; at scale, heavy groups can be
    pre-cut with an approximate per-group count + hash-prefix filter so
    the window only sorts ~k x safety_factor rows per group."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(hash_key_col(id_col, salt), F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def importance_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    max_weight: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability
    weight/max_weight — the data-mixing primitive (e.g. upweight long or
    high-quality documents) — implemented as hash_fraction < ratio so
    selection is reproducible across runs, retries, partitionings, and
    engines (rand()-based Bernoulli is none of those).

    The hash fraction is the first 13 hex chars of md5 (52 bits — every
    such integer is exactly representable in a double, so the division
    by 2^52 and the comparison are bit-exact everywhere)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    frac = (
        F.conv(F.substring(hash_key_col(id_col, salt), 1, 13), 16, 10).cast("bigint")
        / F.lit(float(1 << 52))
    )
    return df.filter(frac < w.cast("double") / F.lit(float(max_weight)))


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 8,
    salt: str = "ep0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus shuffle into training shards — the
    epoch-order primitive: every row gets a (shard, pos) from the md5
    of its id and a salt, so the training order is reproducible across
    runs, engines, and retries, and re-salting ("ep1") yields an
    independent order for the next epoch. rand() can do neither.

    shard comes from the first two hex nibbles (md5 is uniform, so
    shards are balanced to ~ n/256 variance); pos is the rank of the
    hash within the shard — a per-shard window, never a global sort.
    Output: (id, shard, pos)."""
    from pyspark.sql import Window

    hexd = "0123456789abcdef"
    h = hash_key_col(id_col, salt)
    # nibble value via position-in-alphabet: portable to any SQL engine
    n1 = F.expr(f"instr('{hexd}', substring(md5(concat(cast({id_col} as string), '{salt}')), 1, 1))") - 1
    n2 = F.expr(f"instr('{hexd}', substring(md5(concat(cast({id_col} as string), '{salt}')), 2, 1))") - 1
    shard = F.pmod(n1 * 16 + n2, F.lit(n_shards)).cast("bigint")
    out = df.select(F.col(id_col), h.alias("__h"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return out.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def temperature_resample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    total_target: int | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-balanced domain mixture (tau = 0.5), the data-mixing
    primitive behind multilingual/multi-source corpus rebalancing:
    domain d gets a row budget proportional to sqrt(n_d), which
    upsamples tail domains and downsamples dominant ones (the standard
    temperature-sampling mixture with T=2 applied to corpus counts).

    Every step is integer/deterministic so the SAME physical copies
    come out of any engine, run, or retry:

    - weight  s_d = floor(sqrt(n_d) * 2^20)  (sqrt of an integer is
      correctly rounded IEEE, and the 2^20 scale keeps 6 hex digits of
      sub-integer precision through the floor);
    - budget  target_d = total_target * s_d div sum(s_d)  (BIGINT);
    - each row's copy count is target_d div n_d, plus one for the
      target_d mod n_d rows ranked first by md5(id || salt) inside the
      domain — a deterministic 'which rows get the remainder' rule;
    - copies materialize as explode(sequence(1, n_copies)), so a
      domain downsampled below 1x simply drops its unranked rows.

    Scale: one tiny domain-count aggregate broadcast back, one
    per-domain window for the remainder rank, one explode. No driver
    loop; the explode fan-out equals the output row count by
    construction. Default total_target = current corpus size (pure
    rebalancing at constant scale).

    Output: (id, domain, copy_id) with copy_id in 1..n_copies.
    """
    from pyspark.sql import Window

    dom = F.col(domain_col)
    if total_target is None:
        total_target = df.count()  # one job; pass explicitly to skip
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_d"))
    weights = counts.withColumn(
        "s_d", F.floor(F.sqrt(F.col("n_d")) * F.lit(float(1 << 20))).cast("bigint")
    )
    # sum(s_d) over the (tiny) domain relation: window-total avoids a
    # second aggregate job and keeps everything one plan
    # BIGINT-exact budget: bigint*bigint stays bigint and `div` is
    # integer division — a double product would lose ulps past 2^53
    weights = weights.withColumn(
        "s_tot", F.sum("s_d").over(Window.partitionBy(F.lit(1)))
    ).withColumn(
        "target_d",
        F.expr(f"CAST({int(total_target)} AS BIGINT) * s_d div s_tot"),
    )

    w = Window.partitionBy(domain_col).orderBy(hash_key_col(id_col, salt), F.col(id_col))
    ranked = df.select(F.col(id_col), dom.alias(domain_col)).withColumn(
        "rk", F.row_number().over(w)
    )
    sized = ranked.join(F.broadcast(weights), domain_col).withColumn(
        "n_copies",
        F.expr("target_d div n_d")
        + F.when(F.col("rk") <= F.col("target_d") % F.col("n_d"), 1).otherwise(0),
    )
    # sequence(1, 0) in Spark DESCENDS to [1, 0]; guard with an empty
    # array so zero-copy rows drop out of the inner explode
    seq = F.when(
        F.col("n_copies") >= 1, F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))
    ).otherwise(F.array().cast("array<bigint>"))
    return sized.select(
        id_col,
        domain_col,
        F.explode(seq).alias("copy_id"),
    )


def quality_budget_select(
    df: DataFrame,
    score_col: str,
    budget_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_bands: int = 32,
    band_threshold_rows: int = 1_000_000,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Select the highest-quality documents until a corpus-wide token
    budget: a doc is included iff the EXACT cumulative token count of
    every better-ranked doc (score DESC, id ASC) is below the budget
    (here total_tokens div budget_den — INTEGER division, matching the
    oracle's `//` exactly even past the ~2^52 spacing where a double
    divide-then-truncate can round differently — derived from the
    corpus itself so the same docs select at any scale factor). The
    "train on the best X% of tokens" primitive of quality-pruning
    pipelines (quality-ranked data selection).

    Scale shape — the naive form is ONE global ordered window (single
    reducer over the corpus: a non-starter). This computes the same
    integer cumulative sum in three phases:

      1. per-SCORE token totals (hash agg) + a running sum across the
         per-score relation — a window over O(distinct scores) rows,
         not O(docs);
      2. per-(score, id-RANGE-band) totals + a running sum across the
         O(id_bands) bands of each score — the guard for COARSE scores
         (an integer 0-5 quality tier would otherwise make one score's
         partition ≈ the whole corpus). Bands are (id - min_id) div
         ceil(span / id_bands): monotone in id, so the decomposition
         preserves the (score DESC, id ASC) order bit-exactly; min/max
         ride in the same single aggregation that derives the budget.
         Banding is ADAPTIVE and decided in-plan (r7 verdict #2): the
         same scalars aggregation carries count + approx ndv(score),
         and the band expression collapses to 0 whenever the expected
         per-score partition (n div ndv) is already under
         band_threshold_rows — a high-cardinality score (the common
         case: char counts, model logits) skips the sub-partitioning
         work it doesn't need, while a 0-5 tier at corpus scale still
         bands. Both runtime paths produce bit-identical output.
         SKEW CAVEAT: the gate compares the MEAN per-score count, so a
         distribution with many distinct scores but one dominant value
         (millions of identical zero-score docs under a long
         real-valued tail) passes the gate and reinstates the single
         huge window partition for that one score — output stays
         correct, only the skew resilience is lost. Callers who know
         the score is skewed should pass ``band_threshold_rows=0`` to
         force banding unconditionally (the gate then fires for any
         corpus with more rows than distinct scores).
      3. a within-(score, band) running sum — partitions bounded by
         n / (ndv(score) * id_bands) for near-uniform ids.

    cum_before = (tokens of strictly better scores) + (tokens of
    same-score earlier bands) + (tokens of same-band earlier ids):
    exactly the global window's value, as BIGINTs, so the result is
    bit-identical to the single-window SQL a warehouse would write
    (the oracle form). A non-numeric id column falls back to band 0
    (phase 2 degenerates; keep scores granular in that case).

    Output: (id, score, n_tokens, cum_before) for selected docs only.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import NumericType

    from .text import tokens_col

    # n_tokens_col: budget in a caller-supplied token currency (e.g. a
    # learned-tokenizer count from bpe_apply — the v5 prep pipeline)
    # instead of the whitespace-token heuristic over text_col
    toks = (
        F.col(n_tokens_col).cast("bigint")
        if n_tokens_col
        else F.size(tokens_col(text_col)).cast("bigint")
    )
    t = df.select(
        F.col(id_col),
        F.col(score_col).alias("score"),
        toks.alias("n_tokens"),
    )
    numeric_id = isinstance(t.schema[id_col].dataType, NumericType)
    scalars = t.agg(
        F.expr(f"sum(n_tokens) div {int(budget_den)}").cast("bigint").alias("budget"),
        F.min(id_col).alias("__id_mn"),
        F.max(id_col).alias("__id_mx"),
        F.count(F.lit(1)).alias("__n"),
        F.approx_count_distinct("score").alias("__ndv"),
    )
    t2 = t.crossJoin(F.broadcast(scalars))
    if numeric_id and id_bands > 1:
        # ceil_span = span div id_bands + 1 > span / id_bands, so
        # band = (id - mn) div ceil_span lands in [0, id_bands - 1];
        # pure BIGINT arithmetic, monotone in id, and no (id * bands)
        # overflow for ids anywhere in the bigint range. The
        # need-banding gate compares EXPECTED per-score rows (integer
        # n div ndv — no overflow for any n) against the threshold, so
        # the decision rides the broadcast scalars instead of an eager
        # driver job.
        t2 = (
            t2.withColumn(
                "__span",
                F.col("__id_mx").cast("bigint") - F.col("__id_mn").cast("bigint"),
            )
            .withColumn(
                "band",
                F.when(
                    (F.col("__span") > 0)
                    & (
                        F.expr("__n div greatest(__ndv, cast(1 as bigint))")
                        > F.lit(int(band_threshold_rows))
                    ),
                    F.expr(
                        f"(cast({id_col} as bigint) - cast(__id_mn as bigint)) "
                        f"div (__span div {int(id_bands)} + 1)"
                    ),
                ).otherwise(F.lit(0).cast("bigint")),
            )
            .drop("__span")
        )
    else:
        t2 = t2.withColumn("band", F.lit(0).cast("bigint"))
    # the min/max/count scalars only exist to derive the band; don't
    # carry them through the shuffles below
    t2 = t2.drop("__id_mn", "__id_mx", "__n", "__ndv")
    per_band = t2.groupBy("score", "band").agg(
        F.sum("n_tokens").alias("band_tok")
    )
    w_scores = (
        Window.orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    score_cum = (
        per_band.groupBy("score")
        .agg(F.sum("band_tok").alias("score_tok"))
        .select(
            "score",
            F.coalesce(F.sum("score_tok").over(w_scores), F.lit(0))
            .cast("bigint")
            .alias("cum_score_before"),
        )
    )
    w_bands = (
        Window.partitionBy("score")
        .orderBy(F.col("band").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    band_cum = per_band.select(
        "score",
        "band",
        F.coalesce(F.sum("band_tok").over(w_bands), F.lit(0))
        .cast("bigint")
        .alias("cum_band_before"),
    )
    w_within = (
        Window.partitionBy("score", "band")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # One doc-side join, not two (the r7 shape joined band_cum and
    # score_cum separately — two shuffles of the doc relation): merge
    # the two tiny cumulative relations first (O(ndv * bands) rows
    # joining O(ndv) rows), then hit the docs once. AQE picks
    # broadcast vs shuffle for the merged side by its actual size.
    cum_rel = band_cum.join(score_cum, "score")
    ranked = (
        t2.join(cum_rel, ["score", "band"])
        .withColumn(
            "cum_before",
            (
                F.col("cum_score_before")
                + F.col("cum_band_before")
                + F.coalesce(F.sum("n_tokens").over(w_within), F.lit(0))
            ).cast("bigint"),
        )
    )
    return ranked.filter(F.col("cum_before") < F.col("budget")).select(
        id_col, F.col("score"), "n_tokens", "cum_before"
    )


def cluster_balanced_sample(
    emb: DataFrame,
    per_bucket: int = 20,
    n_planes: int | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    target_bucket_rows: int = 128,
    stats: "CorpusStats | None" = None,
) -> DataFrame:
    """Diversity (cluster-balanced) sampling: keep at most
    ``per_bucket`` vectors per hyperplane-LSH bucket, chosen
    deterministically by ascending id — the embedding-space analog of
    per-domain caps, used to keep a training mix from being dominated
    by one dense region of embedding space (DataComp-style balanced
    subset construction).

    One shuffle keyed on the bucket; the per-bucket window is bounded
    by the bucket occupancy, which the plane count controls. By default
    the plane count is DERIVED from the corpus size
    (similarity.adaptive_n_planes, the same adaptive-fan-out contract
    as every LSH operator here — r6 verdict finding #3: a fixed
    n_planes=4 means each row_number partition holds ~n/16 of the data
    at corpus scale). Pass ``n_planes`` explicitly for a pinned bucket
    function (e.g. a cross-engine oracle), at the cost of one count()
    job saved — or pass ``stats`` from one shared stats.corpus_stats
    pass so a composed pipeline derives every adaptive operator's
    scalars from a single corpus scan (r7 verdict #3 / ADVICE r7 #4:
    the adaptive default otherwise runs its own count()+head() at
    plan-construction time). NOTE: the adaptive default (n_planes=None)
    changed the bucket function — and thus the kept set — for callers
    that relied on the old fixed n_planes=4; pin n_planes to reproduce
    pre-r7 output.

    Output: (id, bucket, bucket_rank) for the kept rows.
    """
    from pyspark.sql import Window

    from .similarity import adaptive_n_planes, lsh_bucket_col

    if n_planes is None:
        n = stats.n_rows if stats is not None else emb.count()
        n_planes = adaptive_n_planes(n, target_bucket_rows)
    if dim is None and stats is not None:
        dim = stats.dim
    if dim is None:
        dim = len(emb.select(vec_col).head()[0])
    bucketed = emb.select(
        F.col(id_col),
        lsh_bucket_col(F.col(vec_col), dim, n_planes=n_planes, seed=seed)
        .cast("bigint")
        .alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(F.col(id_col).asc())
    return (
        bucketed.withColumn("bucket_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("bucket_rank") <= per_bucket)
    )


def dsir_proxy_scores(
    df: DataFrame,
    target_filter: Column,
    n_buckets: int = 256,
    scale: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed-feature importance scores for data selection — the DSIR
    shape (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): estimate how target-like each document is
    from the ratio of hashed-token frequencies in a TARGET slice vs
    the RAW corpus, then resample by that score upstream
    (importance_sample composes directly).

    Deviation from the paper, on purpose: DSIR sums per-feature
    LOG-ratios; ln() is not bit-portable across engines, so the score
    here is the sum of integer-QUANTIZED ratios — per bucket,
    ((cnt_target+1)·scale) div (cnt_raw+1), accumulated as exact
    BIGINTs over each token occurrence. Same monotone "target-like
    tokens score high" signal, engine-exact.

    Scale shape: tokens explode once; the bucket of each DISTINCT
    token is computed once and joined back (md5-nibble bucketing, the
    portable trick shuffle_shards uses); the two frequency aggs are
    O(n_buckets) relations that broadcast back onto the token stream;
    the per-doc sum is one hash agg. No windows, no driver state.

    Output: (id, n_tokens, dsir_score) — one row per doc with ≥1 token.
    """
    from .text import tokens_col

    hexd = "0123456789abcdef"
    toks = df.select(
        F.col(id_col),
        target_filter.alias("__target"),
        F.explode(tokens_col(text_col)).alias("token"),
    )
    n1 = F.expr(f"instr('{hexd}', substring(md5(token), 1, 1))") - 1
    n2 = F.expr(f"instr('{hexd}', substring(md5(token), 2, 1))") - 1
    # bucket per OCCURRENCE, map-side (r17): the distinct-token
    # featurization + join-back shape this shared with
    # linear_classifier_scores paid two shuffles of the occurrence
    # stream to save a ~100 ns md5 — see classify.py for the measured
    # A/B (outputs identical; the direct form keeps everything before
    # the two hash aggregations shuffle-free at any scale). The narrow
    # (id, target, bucket) relation feeds BOTH the frequency agg and
    # the final scored agg, so persist it — otherwise each consumer
    # re-tokenizes the corpus (isolated 7-run medians both orders:
    # joined 1.41-1.57 s, direct unpersisted 1.59-1.65, direct+persist
    # 1.01-1.14). At scale the cache is disk-backed at worst — the
    # same bytes the old shape pushed through two shuffles, minus the
    # network hop.
    from ..caching import tracked_persist

    with_b = tracked_persist(
        toks.select(
            F.col(id_col),
            F.col("__target"),
            F.pmod(n1 * 16 + n2, F.lit(n_buckets)).cast("bigint").alias("bucket"),
        )
    )
    freq = with_b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt_raw"),
        F.count(F.when(F.col("__target"), F.lit(1))).alias("cnt_target"),
    )
    ratio = freq.select(
        "bucket",
        F.expr(f"((cnt_target + 1) * {scale}) div (cnt_raw + 1)").alias("ratio_q"),
    )
    return (
        with_b.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("ratio_q").cast("bigint").alias("dsir_score"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    groups: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundaries: tuple[tuple[str, str], ...] = (("val", "0c"), ("test", "1a")),
    default_split: str = "train",
    salt: str = "",
) -> DataFrame:
    """Train/val/test assignment keyed on the duplicate-GROUP canonical
    id instead of the document id — so two copies of the same content
    can never straddle the train/eval boundary (the split-leakage
    failure mode that inflates eval scores; doc-keyed hash_split has
    it by construction whenever dedup is imperfect).

    ``groups=None`` (the oracle-checkable default) groups by EXACT
    normalized content (dedup.exact_duplicate_groups); pass a
    (doc, cluster_id) relation — e.g. connected_clusters over
    minhash_lsh_pairs — to key on NEAR-duplicate clusters instead
    (pytest-verified composition; not single-query SQL-expressible).

    Scale shape: one hash agg on the content key (or one join against
    the cluster relation), then the same scan-side hash-band split as
    hash_split, applied to the canonical id. Output: (id, canonical_id,
    split).
    """
    if groups is None:
        norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
        keyed = df.select(F.col(id_col), F.md5(norm).alias("__k"))
        canon = keyed.groupBy("__k").agg(F.min(id_col).alias("canonical_id"))
        assigned = keyed.join(canon, "__k").select(id_col, "canonical_id")
    else:
        g = groups.select(
            F.col(groups.columns[0]).alias(id_col),
            F.col(groups.columns[1]).alias("canonical_id"),
        )
        assigned = (
            df.select(id_col)
            .join(g, id_col, "left")
            # singleton docs (in no dup cluster) are their own canonical
            .select(
                id_col,
                F.coalesce(F.col("canonical_id"), F.col(id_col)).alias("canonical_id"),
            )
        )
    return hash_split(
        assigned,
        "canonical_id",
        boundaries=boundaries,
        default_split=default_split,
        salt=salt,
    ).select(id_col, "canonical_id", "split")


def kcenter_select(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_rows: int = 1024,
) -> list[int]:
    """Greedy k-center coreset selection (Gonzalez '85; the classic
    2-approximation of the k-center cover): seed with the minimum-id
    vector, then k-1 times pick the point FURTHEST from the selected
    set — the diversity-maximizing subset the cluster-balanced sampler
    approximates by buckets, here computed exactly. The coreset is the
    standard diversity-selection primitive for training-data curation
    (pick prototypes to label/keep, cap redundancy after dedup).

    Scale/determinism shape (r18 — batched rounds): the old loop ran k
    driver rounds of one top-1 collect each (k full jobs at the fixed
    per-action floor). Each cluster round now collects the TOP
    ``batch_rows`` rows by (distance DESC, id ASC) — a bounded
    O(batch_rows * dim) driver payload (~0.5 MB at the default, the
    same traffic class as a small broadcast) — and continues the
    greedy selection DRIVER-SIDE over that candidate pool with the
    SAME exact-decimal arithmetic Spark runs (per-dim IEEE (a-b)^2,
    shortest-repr-quantized to 18 decimals — the double→DECIMAL(38,18)
    cast law pinned in r13 — summed exactly; python Decimal mirrors it
    bit-for-bit, the exact_probe_order precedent). A driver-side pick
    is taken ONLY while it provably dominates every row left on the
    cluster: uncollected rows can only have current distance ≤ the
    last collected row's (distances only shrink as centers are added),
    so picks require best > that bound STRICTLY (a tie could hide a
    smaller-id uncollected winner). When the bound fails, the relation
    is extended incrementally — least(__d, distance to each
    driver-side pick), the same associative DECIMAL fold as before, so
    it still equals the oracle's flat F.least exactly — re-persisted
    and re-collected; the first pick after any fresh collect is the
    relation's true global argmax, so every round makes progress and
    the job count is at worst the old k (distance evals stay O(n*k)
    total) and at best 2 jobs (seed + one batch) when one pool serves
    all k picks. Driver traffic stays O(batch_rows * dim) floats
    regardless of corpus size. For k in the thousands use
    cluster_balanced_sample, the bucketed approximation of exactly
    this objective.

    Degenerate k: if the relation has fewer than k DISTINCT vectors,
    selection stops when the coverage radius reaches 0 and returns the
    distinct centers found (the unrolled SQL oracle instead replays
    full rounds, so the oracle'd entry keeps k well under the
    fixture's distinct count)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from .ivf import _sq_dist

    if k < 1:
        raise ValueError(f"k={k}: need at least one center")
    if batch_rows < 1:
        raise ValueError(f"batch_rows={batch_rows}: need at least one row")
    first = emb.select(id_col, vec_col).orderBy(id_col).limit(1).collect()
    if not first:
        raise ValueError("kcenter_select over an empty relation")
    selected = [(first[0][0], [float(x) for x in first[0][1]])]
    vec = F.col(vec_col)

    quantum = Decimal("0.000000000000000001")  # 18 frac digits = DEC(38,18)

    def sq_py(a: list[float], b: list[float]) -> Decimal:
        # Decimal(repr(.)) — shortest-repr rounding, matching Spark's
        # double->decimal(38,18) cast (r13: Decimal(d*d) would quantize
        # the exact binary double and diverge at the 18th digit)
        total = Decimal(0)
        for x, y in zip(a, b):
            d = x - y
            total += Decimal(repr(d * d)).quantize(quantum, rounding=ROUND_HALF_UP)
        return total

    # scoped persist chain, NOT the global tracked registry (the
    # unigram_train reason: callers may hold tracked frames a global
    # release would free mid-plan); prev is released AFTER the collect
    # that materializes cur, so no generation recomputes from source
    cur = emb.select(
        id_col, vec_col, _sq_dist(vec, np.asarray(selected[0][1])).alias("__d")
    ).persist()
    prev = None
    n_applied = 1  # how many selected centers cur's __d folds in
    radius_zero = False
    try:
        while len(selected) < k and not radius_zero:
            rows = (
                cur.orderBy(F.desc("__d"), F.asc(id_col))
                .limit(batch_rows)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            # a full batch means rows may remain on the cluster; their
            # CURRENT distance is <= the last collected row's (it only
            # shrinks as centers are added), the driver-pick bound
            has_outside = len(rows) == batch_rows
            d_bound = rows[-1]["__d"] if has_outside else None
            # NULL distances (NULL embeddings) sort last under DESC and
            # can never be picked — drop them from the driver pool; a
            # NULL bound row means every uncollected row is NULL too,
            # so the outside bound vacuously holds
            if has_outside and d_bound is None:
                has_outside = False
            keep = [r for r in rows if r["__d"] is not None]
            if not keep:
                raise ValueError(
                    "kcenter_select: every candidate distance is NULL — "
                    "NULL embedding vectors in the relation?"
                )
            ids = [r[0] for r in keep]
            vecs = [[float(x) for x in r[1]] for r in keep]
            dists = [r["__d"] for r in keep]
            varr = np.asarray(vecs, dtype=np.float64)
            fresh = True
            while len(selected) < k:
                dmax = max(dists)
                if not (fresh or not has_outside or dmax > d_bound):
                    break  # an uncollected row could win — re-collect
                if dmax == 0:
                    # every vector coincides with a selected center:
                    # coverage radius is 0 (the first post-collect pick
                    # is the TRUE global argmax, so this is exact) —
                    # return the < k DISTINCT centers (r13 review)
                    radius_zero = True
                    break
                bi = min(i for i, d in enumerate(dists) if d == dmax)
                bvec = vecs[bi]
                selected.append((ids[bi], bvec))
                fresh = False
                if len(selected) == k:
                    break
                # fold the new center into the pool's distances — exact
                # Decimal only where a float screen (generous 1e-6
                # relative + 1e-15 absolute margin vs ~1e-14 true float
                # error) says the min could actually change; everywhere
                # else min(d, new) is provably d
                appr = ((varr - np.asarray(bvec)) ** 2).sum(axis=1)
                for i, d in enumerate(dists):
                    if appr[i] - 1e-6 * appr[i] - 1e-15 <= float(d):
                        nd = sq_py(vecs[i], bvec)
                        if nd < d:
                            dists[i] = nd
            if len(selected) == k or radius_zero:
                break
            # bound failed: extend the relation with the driver-side
            # picks (incremental least over the persisted generation —
            # associative DECIMAL min, equal to the flat oracle fold)
            dist_col = F.col("__d")
            for _, cv in selected[n_applied:]:
                dist_col = F.least(dist_col, _sq_dist(vec, np.asarray(cv)))
            nxt = cur.select(id_col, vec_col, dist_col.alias("__d")).persist()
            n_applied = len(selected)
            prev, cur = cur, nxt
    finally:
        cur.unpersist()
        if prev is not None:
            prev.unpersist()
    return [i for i, _ in selected]
