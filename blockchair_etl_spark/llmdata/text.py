"""Text-analysis operators for large-scale training-data pipelines.

Language ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting — all as
pure Column expressions (JVM-side, whole-stage-codegen'd; no Python in
the hot path). Every function is deterministic and has an exact ANSI-SQL
equivalent, so the operators are oracle-checkable cross-engine.

At 100 TB these are embarrassingly parallel scan-side maps: no shuffle,
no state — the scan partitioning is the parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..caching import tracked_persist

# Tokenization shared by every text operator (and by dedup.py): lowercase,
# split on non-alphanumeric runs, drop empties. Simple enough to behave
# identically under Java regex (Spark) and RE2 (DuckDB).
TOKEN_SPLIT_RE = "[^a-z0-9]+"

# A BPE-ish pre-tokenizer: letter runs, single digits, or single
# non-alphanumeric-non-space marks — approximates byte-pair-encoder
# pre-segmentation counts without a vocab.
BPE_ISH_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "los", "de", "que", "es", "una"],
    "fr": ["le", "la", "les", "et", "des", "est", "une"],
    "zh": ["de", "le", "shi", "bu", "wo", "ni", "ta"],
}


def tokens_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != "")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish pre-tokens, chars."""
    toks = tokens_col(text_col)
    # bigint outputs: DuckDB's len()/length() return BIGINT, Spark's
    # size()/length() return INT — align so result schemas agree too
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens_ws"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(BPE_ISH_RE)).cast("bigint").alias("n_tokens_bpe"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document quality heuristics: length, mean word length, punctuation
    density, stopword ratio, and a composite [0,1] score. Ratios are
    expressed with integer counts and double division only (no float
    aggregation), so results are bit-identical across engines."""
    text = F.col(text_col)
    toks = tokens_col(text_col)
    n_chars = F.length(text)
    n_words = F.size(toks)
    n_punct = F.regexp_count(text, F.lit(r"[^a-zA-Z0-9\s]"))
    en_stop = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*en_stop)))
    word_chars = F.length(F.array_join(toks, ""))
    avg_word_len = F.when(n_words > 0, word_chars / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    # Composite: reward mid-length words and some stopword presence,
    # penalize punctuation soup. Arbitrary but fixed weights.
    score = (
        F.least(F.lit(1.0), n_words / F.lit(50.0)) * F.lit(0.4)
        + F.least(F.lit(1.0), stop_ratio * F.lit(5.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * F.lit(4.0))) * F.lit(0.3)
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram/stopword language ID over a fixed language set. Scores =
    stopword hits per language; argmax with a fixed priority order on
    ties (en, de, es, fr, zh) keeps the choice deterministic."""
    toks = tokens_col(text_col)

    def _hit_count(sw: list[str]):
        # single-arg lambda: a default-arg closure would make PySpark
        # treat it as the 2-ary (element, index) form
        return F.size(F.filter(toks, lambda x: x.isin(*sw)))

    scores = {lang: _hit_count(sw) for lang, sw in STOPWORDS.items()}
    s = {k: F.col(f"score_{k}") for k in STOPWORDS}
    pred = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] >= s["zh"]), "de")
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    scored = df.select(
        F.col(id_col),
        *[scores[lang].cast("bigint").alias(f"score_{lang}") for lang in STOPWORDS],
    )
    return scored.select(
        id_col,
        *[f"score_{lang}" for lang in STOPWORDS],
        pred.alias("predicted_lang"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition filters: duplicate-word fraction, most-
    frequent-word fraction, and duplicate-bigram fraction per document.

    Pure Column expressions over the token array — per-row compute is
    O(words · distinct_words) which is fine for natural documents (the
    distinct set is small); no shuffle beyond the conditional
    parallelism widening (stats.fanout_parallel: the per-row compute is
    the cost here, so a one-file corpus must not run it on one task),
    no UDF. High values flag the boilerplate/keyword-stuffing documents
    a pretraining pipeline drops.
    """
    from .stats import fanout_parallel

    df = fanout_parallel(df)
    toks = tokens_col(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    top_count = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda w: F.size(F.filter(toks, lambda x: x == w)),
        )
    )
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    n_grams = F.size(grams)
    n_distinct_grams = F.size(F.array_distinct(grams))
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_words"),
        n_distinct.cast("bigint").alias("n_distinct_words"),
        F.when(n > 0, (n - n_distinct) / n).otherwise(F.lit(0.0)).alias("dup_word_ratio"),
        F.when(n > 0, top_count / n).otherwise(F.lit(0.0)).alias("top_word_ratio"),
        F.when(n_grams > 0, (n_grams - n_distinct_grams) / n_grams)
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_ratio"),
    )


# Conservative patterns that behave identically under Java regex (Spark)
# and RE2 (DuckDB): no backrefs, no lookaround.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_NUMBER_RE = "[0-9]{2,}"


def pii_scrub(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII redaction: replace emails and multi-digit number runs with
    typed placeholders, keeping match counts for audit. Scan-side map —
    the 100 TB shape is the scan partitioning itself."""
    text = F.col(text_col)
    n_emails = F.regexp_count(text, F.lit(PII_EMAIL_RE))
    n_numbers = F.regexp_count(text, F.lit(PII_NUMBER_RE))
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"), PII_NUMBER_RE, "<NUM>"
    )
    return df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed"),
        n_emails.cast("bigint").alias("n_emails"),
        n_numbers.cast("bigint").alias("n_numbers"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized lowercased
    text (exact-dup key) plus a content minhash (min over md5'd tokens —
    a 1-hash rolling sketch that survives token reordering)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    toks = tokens_col(text_col)
    min_tok_hash = F.array_min(F.transform(toks, lambda t: F.md5(t)))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("content_md5"),
        min_tok_hash.alias("min_token_hash"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MOSS winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): the
    position-robust document fingerprint SET — from the hashes of all
    character k-grams of the normalized text, select each sliding
    window-of-``window``'s minimum (rightmost on ties), dedup. The
    winnowing guarantee: any match of length ≥ window + k - 1 between
    two documents shares at least one selected fingerprint, with
    expected density 2/(window+1) — the local-selection property the
    global-min sketch (fingerprints' min_token_hash) and MinHash lack,
    and the standard primitive for plagiarism / code-clone / quoted-
    passage detection.

    Distributed shape: per-k-gram hashes are INDEPENDENT md5-prefix
    hashes, not a sequential Karp-Rabin chain — the rolling recurrence
    is a single-pass cpu optimization, not a semantic requirement, and
    independent hashing is what parallelizes (any engine computes the
    identical values, which Karp-Rabin mod-arithmetic would also give
    but at per-row sequential cost). Selection runs ENTIRELY in
    array-space inside the document's row — hash array, per-window
    array_min over O(w) slices, array_distinct, then one explode of
    the selected set — so the whole operator is a narrow map with ZERO
    shuffles. The explode-then-window-min formulation was measured
    FASTER locally (4.0 s vs 5.0 s at sf0.1: window-min is codegen'd,
    higher-order functions are interpreted) but shuffles + sorts the
    exploded gram stream — ~(doc chars × 25 bytes) through the wire,
    several times the corpus size at 100 TB — for what is row-local
    work; the zero-shuffle form is the one that survives cluster
    scale, and winnowing dedup is per-document by definition so no
    global distinct is needed either. Documents with fewer than
    ``window`` k-grams get one window covering all positions, so every
    non-empty document has ≥1 fingerprint. Output: (doc, pos, fp),
    distinct per doc.

    Bounds (r15 advice): the packed key encodes position as the
    10-digit zero-padded (1e9 − pos), so a document with ≥ 1e9
    NORMALIZED chars would produce negative pack values whose string
    ordering (and pos decode) silently corrupt the selection — the
    plan raises in-row (one length check per document, evaluated once
    in the positions guard, never per element) instead. Memory shape:
    the whole ~25-bytes-per-char hash array materializes INSIDE one
    row, so a single huge document concentrates ~25× its normalized
    length on one task — at the 1e9 bound that is ~25 GB for one row;
    corpora with multi-GB single documents should chunk upstream
    (chunk_documents) before fingerprinting."""

    # normalization MUST be materialized as its own attribute before
    # the per-position lambda references it: an inlined regexp_replace
    # inside the transform body re-evaluates over the WHOLE text once
    # per character position — O(len²) per document (measured: 22.2 s
    # at sf0.1 inlined vs ~2 s materialized). The multiple non-cheap
    # references ALSO keep CollapseProject from re-inlining it.
    normed = df.select(
        F.col(id_col).alias("doc"),
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", "").alias(
            "__s"
        ),
    )
    # r17 widening: the whole selection is per-row array-space compute
    # (~1 md5 + string pack per char), and a small corpus arriving as
    # one parquet file otherwise runs it on ONE task — measured 4.5 s
    # single-threaded at sf0.1 vs ~0.5 s widened, far past the
    # fanout_parallel ≥1 s/split bar (the same rule that widened
    # repetition_stats). The shuffle payload is the NORMALIZED text
    # only, paid once; at 100 TB the scan has thousands of splits and
    # fanout_parallel skips itself. Zero-shuffle for the gram stream is
    # preserved — grams still never leave their row.
    from .stats import fanout_parallel

    normed = fanout_parallel(normed)
    s = F.col("__s")
    # sequence(1, 0) DESCENDS to [1, 0] (the exploded_shingles gotcha):
    # documents with fewer than k normalized chars guard with an
    # explicit empty array. Column.substr takes COLUMN start/len (the
    # lambda position var); F.substring's python signature is int-only.
    # the ≥1e9 guard rides the SAME when-chain as the short-doc guard:
    # one O(1)-per-row branch on the already-computed length, never a
    # per-element re-check (the O(len²) HOF trap documented above)
    positions = (
        F.when(
            F.length(s) >= F.lit(1_000_000_000),
            F.raise_error(
                F.concat(
                    F.lit(
                        "winnowing_fingerprints: document has >= 1e9 "
                        "normalized chars; the packed-key position "
                        "encoding supports < 1e9 — chunk upstream"
                    )
                )
            ).cast("array<int>"),
        )
        .when(
            F.length(s) >= k,
            F.sequence(F.lit(1), F.length(s) - (k - 1)),
        )
        .otherwise(F.array().cast("array<int>"))
    )
    # one 25-char STRING key per position: 15 lowercase-hex md5 chars
    # (lexicographic == numeric for a fixed-width hex prefix) ++
    # zero-padded (1e9 - pos), so a plain string array_min IS the
    # winnowing selection (min hash, rightmost position on ties).
    # Measured at sf0.1 against the alternatives: packed-string 5.0 s
    # vs (h, -pos) struct array 6.6 s (array_min's interpreted struct
    # compare + per-slice struct allocs) vs decimal128 packing 5.9 s —
    # and the decimal decode needs a floor-div Spark's decimal '/'
    # (HALF_UP) gets wrong silently.
    hashed = normed.select(
        "doc",
        F.transform(
            positions,
            lambda i: F.concat(
                F.substring(F.md5(s.substr(i, F.lit(k))), 1, 15),
                F.lpad((F.lit(1_000_000_000) - i).cast("string"), 10, "0"),
            ),
        ).alias("__hs"),
    )
    hs = F.col("__hs")
    starts = F.when(
        F.size(hs) >= 1,
        F.sequence(F.lit(1), F.greatest(F.size(hs) - (window - 1), F.lit(1))),
    ).otherwise(F.array().cast("array<int>"))
    selected = F.array_distinct(
        F.transform(starts, lambda j: F.array_min(F.slice(hs, j, window)))
    )
    key = F.col("g")
    return hashed.select("doc", F.explode(selected).alias("g")).select(
        "doc",
        (F.lit(1_000_000_000) - F.substring(key, 16, 10).cast("bigint"))
        .cast("bigint")
        .alias("pos"),
        F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint").alias("fp"),
    )


def winnowing_pairs(
    df: DataFrame,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    threshold: float = 0.2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup / quoted-passage pairs from winnowing fingerprint
    overlap — the MOSS composition: candidates share ≥ ``min_shared``
    selected fingerprints, scored by Jaccard over the documents'
    fingerprint-HASH sets (position-independent, so a passage quoted at
    a different offset still matches). The winnowing guarantee makes
    this the passage-level complement of shingle Jaccard: any shared
    run ≥ window + k - 1 chars contributes at least one shared
    fingerprint, while the fingerprint stream is only ~2/(window+1) of
    the gram stream the shingle self-join would carry.

    Same scale shape as ngram_jaccard_pairs: candidates from a shared-
    fingerprint self-join (disjoint docs never meet); ``max_df`` is the
    scale lever against boilerplate fingerprints (candidates from
    fingerprints in at most max_df docs — Σ df² over rare fps only —
    with n_shared then re-counted EXACTLY over all fps per candidate,
    the ngram_containment_pairs contract: reported scores exact, only
    recall traded). Output: (id_a, id_b, n_shared, jaccard ≥
    threshold), id_a < id_b."""
    fp_sets = tracked_persist(
        winnowing_fingerprints(df, k, window, text_col, id_col)
        .select("doc", "fp")
        .distinct()
    )
    return winnowing_pairs_from_store(
        fp_sets, min_shared=min_shared, threshold=threshold, max_df=max_df
    )


def winnowing_pairs_from_store(
    fp_sets: DataFrame,
    min_shared: int = 2,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """Pair detection over a PREBUILT (doc, fp) fingerprint relation —
    the production reuse shape (the minhash_pairs_from_store
    precedent): fingerprints are extracted once, written to parquet,
    and every passage-dedup query reads the store instead of
    re-normalizing + re-hashing the corpus per run; md5-derived
    fingerprints make today's store comparable with tomorrow's. Rows
    must be distinct per (doc, fp) — winnowing_fingerprints' dedup
    already guarantees it; a raw store write preserves it. Same
    output and semantics as winnowing_pairs on the same corpus."""
    a = fp_sets.select(F.col("doc").alias("id_a"), "fp")
    b = fp_sets.select(F.col("doc").alias("id_b"), "fp")
    if max_df is None:
        sizes = fp_sets.groupBy("doc").agg(F.count(F.lit(1)).alias("n_fp"))
        inter = (
            a.join(b, "fp")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= int(min_shared))
        )
        return (
            inter.join(
                sizes.select(
                    F.col("doc").alias("id_a"), F.col("n_fp").alias("n_a")
                ),
                "id_a",
            )
            .join(
                sizes.select(
                    F.col("doc").alias("id_b"), F.col("n_fp").alias("n_b")
                ),
                "id_b",
            )
            .withColumn(
                "jaccard",
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "n_shared", "jaccard")
        )
    # df-bounded path, r17 reshape (guide §2.3/§2.4 — shuffle fewer
    # bytes, remove shuffles): the exact per-pair re-count used to be
    # cand ⋈ a (fan-out of |cand| × n_fp rows) ⋈ b → groupBy pair — two
    # shuffles of the fanned-out fingerprint stream plus the pair
    # aggregation. The re-count only needs each document's FULL
    # fingerprint set, so collect the per-doc sets ONCE (one doc-keyed
    # aggregation — the same shuffle the old `sizes` agg already paid;
    # n_fp now rides it as size()) and re-count each candidate pair
    # row-locally with array_intersect. fp_sets is distinct per
    # (doc, fp) by contract, so the intersect size IS the exact shared
    # count; sort_array makes the collected set deterministic. Per-doc
    # set size is bounded by document length (the ~2/(w+1) winnowing
    # density), so a row never exceeds the single-document bound the
    # fingerprint builder itself already has. Measured at sf0.1:
    # pairing phase ~3.9 → ~1.5 s (store-backed twin), plan loses the
    # two fan-out joins + pair groupBy (see plans/r17).
    # candidate generation in ONE fp-keyed aggregation (guide §2.4):
    # group docs per fingerprint, keep rare fps (df ≤ max_df — the same
    # HAVING the old `rare` aggregation computed), and expand each
    # bucket's ≤ max_df-doc sorted array into its pairs ROW-LOCALLY —
    # the sorted array makes id_a < id_b free. The old shape shuffled
    # the (doc, fp) stream three more times (a ⋈ rare, b ⋈ rare, then
    # the fp self-join); this one shuffles it once. Per-row expansion
    # is bounded by max_df²/2 pairs by construction.
    ds = F.col("docs")
    pair_structs = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    # both relations feed the pair join twice (a-side and b-side), and
    # both materialize through a shuffle anyway — tracked_persist is
    # the same contract the minhash signature relation uses (measured:
    # the unpersisted composition re-pays the candidate subtree inside
    # the join stage; 4.4 → 1.5 s at sf0.1 with both persisted).
    cand = tracked_persist(
        fp_sets.groupBy("fp")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .filter(F.size(ds) <= int(max_df))
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )
    docsets = tracked_persist(
        fp_sets.groupBy("doc").agg(
            F.sort_array(F.collect_list("fp")).alias("fps"),
            F.count(F.lit(1)).alias("n_fp"),
        )
    )
    joined = cand.join(
        F.broadcast(
            docsets.select(
                F.col("doc").alias("id_a"),
                F.col("fps").alias("fps_a"),
                F.col("n_fp").alias("n_a"),
            )
        ),
        "id_a",
    ).join(
        F.broadcast(
            docsets.select(
                F.col("doc").alias("id_b"),
                F.col("fps").alias("fps_b"),
                F.col("n_fp").alias("n_b"),
            )
        ),
        "id_b",
    )
    # Generate barrier for the intersect (guide §4.4's duplication trap,
    # builtin-expression edition): a plain withColumn + filter lets the
    # optimizer substitute the array_intersect into the join condition —
    # the n_shared ≥ min_shared AND jaccard ≥ threshold predicates each
    # inline their own copy, so every joined row paid THREE intersects
    # (measured 2.1 s of the 4.5 s composition at sf0.1). Filters cannot
    # be pushed through a Generate's generated output, so exploding the
    # 1-element struct pins exactly ONE evaluation per pair.
    n_shared = F.size(F.array_intersect(F.col("fps_a"), F.col("fps_b"))).cast(
        "bigint"
    )
    return (
        joined.select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            F.explode(F.array(F.struct(n_shared.alias("ns")))).alias("r"),
        )
        .select(
            "id_a", "id_b", "n_a", "n_b", F.col("r.ns").alias("n_shared")
        )
        .filter(F.col("n_shared") >= int(min_shared))
        .withColumn(
            "jaccard",
            F.col("n_shared")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def winnowing_fingerprint_store(
    df: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The PERSISTED winnowing index relation: distinct (doc, fp) rows
    with the document's fingerprint-set size ``n_fp`` denormalized onto
    every row — the write-once store the incremental loop appends to
    and probes (the minhash_band_store sibling for the MOSS family).
    Carrying n_fp on the fingerprint rows is what lets the cross probe
    compute each candidate pair's Jaccard denominator WITHOUT a
    store-wide per-doc aggregation at probe time: the store is only
    ever scanned fp-keyed. md5-derived fingerprints are seed-free, so
    rows appended today are comparable with rows appended last month —
    the same portability contract as the band store."""
    fps = winnowing_fingerprints(df, k, window, text_col, id_col).select(
        "doc", "fp"
    ).distinct()
    sizes = fps.groupBy("doc").agg(F.count(F.lit(1)).alias("n_fp"))
    return fps.join(sizes, "doc")


def winnowing_cross_pairs(
    new_fp: DataFrame,
    store: DataFrame,
    min_shared: int = 2,
    threshold: float = 0.2,
    max_df: int | None = None,
    broadcast_new: bool = True,
) -> DataFrame:
    """Winnowing-overlap pairs BETWEEN two fingerprint stores (arriving
    batch vs persisted index): id_a from ``new_fp``, id_b from
    ``store``, exact n_shared and Jaccard over the documents' FULL
    fingerprint sets — the asymmetric half of incremental passage-level
    dedup (within-batch pairs come from winnowing_pairs_from_store over
    the batch alone). Both relations are winnowing_fingerprint_store
    rows: distinct (doc, fp) with n_fp denormalized.

    Scale shape: with ``broadcast_new`` (the daily-ingest default) the
    batch side broadcasts into one fp-keyed hash join over the store's
    fingerprint scan — the corpus-sized store NEVER shuffles and is
    never aggregated per-doc (Jaccard denominators ride the stored
    n_fp column). ``max_df`` bounds candidate fan-out from boilerplate
    fingerprints using df AS OF THIS BATCH — batch df plus store df
    counted over the MATCHED fp subset only (one map-side-combined
    count over the semi-joined store rows, never a store-wide rescan).
    Because corpus df only grows, a fingerprint rare at final scale
    was rare at every probe, so the drained pair set is a SUPERSET of
    the one-shot df-bounded run with every score exact — recall-only
    difference, in the conservative direction (dups found earlier,
    never missed relative to one-shot). With max_df=None the drained
    union across batches equals the one-shot pair set exactly (pytest
    cumulative-parity contract)."""
    a = new_fp.select(
        F.col("doc").alias("id_a"), "fp", F.col("n_fp").alias("n_a")
    )
    if broadcast_new:
        a = F.broadcast(a)
    b = store.select(
        F.col("doc").alias("id_b"), "fp", F.col("n_fp").alias("n_b")
    )
    if max_df is None:
        inter = (
            a.join(b, "fp")
            # at-least-once replay / re-ingest guard: a doc already in
            # the store must not emit a (X, X) self-pair
            .filter(F.col("id_a") != F.col("id_b"))
            .groupBy("id_a", "id_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= int(min_shared))
        )
    else:
        batch_fps = new_fp.select("fp").distinct()
        bdf = new_fp.groupBy("fp").agg(F.count(F.lit(1)).alias("__df_b"))
        # only fps present in the batch can generate candidates, so df
        # is counted over the semi-joined store subset — the probe's
        # own fan-out, never a store-wide aggregation
        matched = b.join(F.broadcast(batch_fps), "fp", "left_semi")
        sdf = matched.groupBy("fp").agg(F.count(F.lit(1)).alias("__df_s"))
        rare = (
            sdf.join(F.broadcast(bdf), "fp")
            .filter(F.col("__df_s") + F.col("__df_b") <= int(max_df))
            .select("fp")
        )
        cand = (
            a.select("id_a", "fp")
            .join(F.broadcast(rare), "fp")
            .join(matched.select("id_b", "fp").join(F.broadcast(rare), "fp"), "fp")
            .filter(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        # exact re-count over ALL shared fps (the winnowing_pairs_from_
        # store contract: scores exact, only recall traded). The join
        # is deliberately NOT force-broadcast: pair_fps is |cand| ×
        # fps-per-doc rows — beyond the broadcast budget for a large
        # backfill batch — and the other side is `matched`, the
        # SEMI-JOINED store subset already bounded by the probe's
        # fan-in, so shuffling it never touches the full store.
        pair_fps = cand.join(
            new_fp.select(
                F.col("doc").alias("id_a"), "fp", F.col("n_fp").alias("n_a")
            ),
            "id_a",
        )
        inter = (
            pair_fps.join(matched.select("id_b", "fp", "n_b"), ["id_b", "fp"])
            .groupBy("id_a", "id_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= int(min_shared))
        )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_shared")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def incremental_winnowing_dedup(
    new_docs: DataFrame,
    store: DataFrame | None,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    threshold: float = 0.2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_new: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Dedup an arriving document batch against the persisted winnowing
    fingerprint index — the MOSS twin of incremental_minhash_dedup /
    incremental_media_dedup / incremental_embedding_dedup, completing
    the incremental family for the passage-level operator.

    Returns (pairs, updated_store): pairs = (id_a from batch, id_b from
    store, exact n_shared, jaccard ≥ threshold), new-vs-store only
    (within-batch dups are the one-shot operator's job);
    updated_store = store ∪ the batch's fingerprint rows (write it back
    for tomorrow). Only the NEW batch pays normalization + k-gram
    hashing + window selection; the store is probed fp-keyed and never
    rescanned — per-day cost independent of corpus size."""
    new_fp = tracked_persist(
        winnowing_fingerprint_store(new_docs, k, window, text_col, id_col)
    )
    if store is None:
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        id_type = new_fp.schema["doc"].dataType
        empty = new_fp.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField("id_a", id_type),
                    StructField("id_b", id_type),
                    StructField("n_shared", LongType()),
                    StructField("jaccard", DoubleType()),
                ]
            ),
        )
        return empty, new_fp
    pairs = winnowing_cross_pairs(
        new_fp,
        store,
        min_shared=min_shared,
        threshold=threshold,
        max_df=max_df,
        broadcast_new=broadcast_new,
    )
    # store ∪ batch with the batch's version winning for re-ingested
    # docs (the _dedup_store_union contract, multi-row-per-doc form:
    # the anti-join key set is DISTINCT docs, not fingerprint rows, so
    # the broadcast stays O(batch docs))
    keys = new_fp.select("doc").distinct()
    if broadcast_new:
        keys = F.broadcast(keys)
    updated = store.join(keys, "doc", "left_anti").unionByName(new_fp)
    return pairs, updated


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF rank.

    Shape at scale: tf is one (doc, term) hash-agg with map-side
    partials; df is a |vocab|-row aggregate of tf (vocab << corpus, so
    the back-join broadcasts); the corpus size N is a 1-row broadcast.
    The raw text is tokenized exactly once.

    The score is the rational idf-proxy ``tf * N / df`` rather than
    ``tf * ln(N/df)``: ln is libm-dependent (not bit-identical across
    engines), while integer multiply + one IEEE division is exactly
    rounded everywhere — and ln is monotone, so the per-doc ranking is
    identical to the textbook formula whenever tf ties are broken the
    same way (they are: by term).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("term_rank") <= k)
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int = 1_000_000,
) -> DataFrame:
    """Posting lists: term -> sorted doc-id list (comma-joined) + df.

    collect_list order is partition-dependent, so the list is
    array_sort-ed before joining — making the output deterministic under
    any partitioning/retry schedule. df bounds drop hapax noise and
    stopword-scale lists (at corpus scale the max_df cut is what keeps
    the widest posting rows bounded)."""
    pairs = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term")
        )
        .distinct()
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("postings"),
        )
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into consecutive ``chunk_tokens``-token
    chunks — the context-window preprocessing step upstream of
    sequence packing (packing.assign_packs).

    Linear shape: tokens are exploded ONCE (posexplode), each token is
    assigned its chunk by integer division, and chunks reassemble with
    one (doc, chunk) hash-agg using concat_ws over an ordered window —
    never the array-lambda slice form, which re-tokenizes per chunk
    (the same quadratic trap documented in dedup.exploded_shingles).

    Output: (doc_id, chunk_idx, chunk_text, n_tokens); the final
    partial chunk is kept (training pipelines drop or pad it downstream
    — that policy belongs to the packer, not the chunker)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "token"),
    )
    assigned = toks.select(
        "doc_id",
        (F.col("pos") / chunk_tokens).cast("bigint").alias("chunk_idx"),
        "pos",
        "token",
    )
    # collect_list has no intra-group order guarantee; sorting by the
    # in-chunk position via a struct sort keeps reassembly deterministic
    return (
        assigned.groupBy("doc_id", "chunk_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s.getField("token"),
                ),
                " ",
            ).alias("chunk_text"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def line_dedup(
    docs: DataFrame,
    line_tokens: int = 2,
    max_line_df: int | DataFrame = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style boilerplate line removal: drop every "line" that occurs
    verbatim in more than ``max_line_df`` distinct documents, then
    reassemble each document from its surviving lines in order.

    Real corpora segment on newlines; the synthetic corpus is a flat
    token stream, so a line is a fixed ``line_tokens``-token window —
    the segmentation differs, the dedup semantics (the C4 pipeline's
    "discard any line repeated across the corpus" rule) are the same.

    Shape at scale: lines are ROW-LOCAL slices of the per-doc token
    array (r17, guide §2.4 — the previous form exploded the token
    stream and re-assembled lines with a (doc, line_no) hash-agg: a
    full token-stream shuffle plus a sort-inside-agg, paid on BOTH
    executions of the prefix since it feeds the line-df and removal
    branches), the line-frequency relation is one hash-agg on line
    text, and the removal join shuffles on line text — boilerplate
    lines are exactly the high-frequency (skewed) keys, and AQE
    skew-join handles them. Reassembly is one ordered hash-agg per
    doc. No window over the whole corpus, no driver state.

    Output: (doc_id, clean_text, n_lines_kept, n_lines_removed); docs
    whose every line was boilerplate — and docs with no tokens at all —
    keep a row with clean_text = '' (left join back to the input ids,
    so the output has exactly one row per input document).
    """
    lt = int(line_tokens)
    lines = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("__t")
    ).select(
        "doc_id",
        # one line per ceil(n_tokens/lt) window, 0-based line_no from
        # posexplode == floor(pos/lt) of the exploded form; the tail
        # line is naturally short (slice past the end). sequence() must
        # be guarded: a stop below the start counts DOWN.
        F.posexplode(
            F.expr(
                f"CASE WHEN size(__t) > 0 THEN "
                f"transform(sequence(1, (size(__t) + {lt - 1}) div {lt}), "
                f"i -> array_join(slice(__t, (i - 1) * {lt} + 1, {lt}), ' ')) "
                "ELSE CAST(array() AS array<string>) END"
            )
        ).alias("line_no", "line_text"),
    ).select("doc_id", F.col("line_no").cast("bigint").alias("line_no"), "line_text")
    line_df = lines.groupBy("line_text").agg(
        F.count_distinct("doc_id").alias("line_df")
    )
    # Filter BEFORE the reassembly agg: boilerplate lines are by
    # definition the overwhelmingly frequent ones, so the collect_list
    # only ever sees the (small) surviving set. The threshold may be a
    # 1-row scalar RELATION (first column) instead of an int: callers
    # deriving it from the corpus itself (e.g. corpus_prep's "5% of
    # docs") broadcast it into the plan rather than paying a separate
    # driver-side count() pass per invocation (r6 verdict finding #2).
    if isinstance(max_line_df, DataFrame):
        # the crossJoin below assumes a SCALAR relation: a multi-row
        # threshold would silently multiply every line row and corrupt
        # reassembled documents, so enforce one row (ADVICE r7 #3)
        thr = F.broadcast(
            max_line_df.limit(1).select(
                F.col(max_line_df.columns[0]).cast("bigint").alias("__max_line_df")
            )
        )
        kept = (
            lines.join(line_df, "line_text")
            .crossJoin(thr)
            .filter(F.col("line_df") <= F.col("__max_line_df"))
            .drop("__max_line_df")
        )
    else:
        kept = lines.join(line_df, "line_text").filter(
            F.col("line_df") <= max_line_df
        )
    kept_agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line_text"))),
                lambda s: s.getField("line_text"),
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    # Anchor on the INPUT ids (a zero-token or all-boilerplate document
    # must keep its row) and derive the per-doc TOTAL line count
    # arithmetically from the token-array length — ceil(n_tokens/width)
    # equals the number of (doc, line_no) groups, with no explode and
    # no third execution of the tokenize+line-agg prefix (the r5 shape
    # ran that prefix 3x — the +85% bench regression the round-5
    # verdict flagged; this runs it 2x: line_df + the removal join).
    all_docs = docs.select(
        F.col(id_col).alias("doc_id"),
        (
            (F.size(tokens_col(text_col)) + F.lit(line_tokens - 1))
            .cast("bigint")
            / F.lit(line_tokens)
        )
        .cast("bigint")
        .alias("n_lines"),
    )
    return all_docs.join(kept_agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("bigint").alias("n_lines_kept"),
        (F.col("n_lines") - F.coalesce(F.col("n_lines_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_lines_removed"),
    )


def bigram_fluency_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram-LM fluency proxy: the mean corpus conditional probability
    p(w2|w1) = c(w1,w2)/c(w1,·) over a document's consecutive token
    pairs. Fluent/boilerplate-heavy text (bigrams the corpus repeats)
    scores high; token salad scores near 1/|V|. The complement of
    rarity_scores (which ranks tokens, not transitions).

    Cross-engine discipline: probabilities are quantized to 2^-20 by
    PURE INTEGER arithmetic — (c12 · 2^20) div c1 — and accumulated as
    exact BIGINTs; the only floating step is one final IEEE division,
    so scores are bit-identical across engines and partitionings (no
    log(), no float sums).

    Scale shape: one posexplode (linear), one window lead per doc (one
    shuffle on doc id), one bigram hash-agg + one prefix hash-agg, and
    two equi-joins back on the bigram/prefix keys (hot boilerplate
    bigrams are skewed keys — AQE skew split applies). No UDF, no
    driver state.

    Output: (doc_id, n_bigrams, sum_p_q20, mean_prob)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "w1"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "w1", "w2")
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        big.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .select(
            "doc_id",
            F.expr("(c12 * 1048576) div c1").alias("p_q20"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("p_q20").alias("sum_p_q20"),
        (
            F.sum("p_q20").cast("double")
            / (F.count(F.lit(1)) * F.lit(1048576)).cast("double")
        ).alias("mean_prob"),
    )


def rarity_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram document-rarity score: the tf-weighted mean corpus
    document frequency of a document's tokens. Boilerplate-heavy docs
    (tokens that appear everywhere) score near n_docs; documents made
    of corpus-rare vocabulary score near 1 — the unigram-LM quality
    signal without the cross-engine hazard of log(): every accumulator
    is an exact BIGINT and the only floating step is one final IEEE
    division, so the score is bit-identical across engines.

    Shape at scale: one distinct + hash-agg for the df relation, one
    broadcast-or-shuffle join back on token, one per-doc hash-agg.

    Output: (doc_id, n_tokens, mean_token_df DOUBLE).
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("token")
    )
    df_rel = (
        tok.distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("token_df"))
    )
    return (
        tok.join(df_rel, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("token_df").alias("sum_df"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("sum_df").cast("double") / F.col("n_tokens").cast("double")).alias(
                "mean_token_df"
            ),
        )
    )


# Accent-fold map shared by normalize_text and its SQL oracle: the two
# strings MUST stay index-aligned (translate maps position-for-position).
ACCENT_SRC = "áàâäãåéèêëíìîïóòôöõøúùûüçñýÿœæ"
ACCENT_DST = "aaaaaaeeeeiiiioooooouuuucnyyoa"
assert len(ACCENT_SRC) == len(ACCENT_DST), "accent fold map misaligned"


def normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical text normalization — the first stage of every corpus
    pipeline, so downstream exact-dedup keys and shingles agree across
    crawls that differ only in case/diacritics/whitespace:

    1. strip C0/C1 control characters (replaced with a space so words
       split by a control char don't fuse);
    2. lowercase;
    3. accent-fold via an explicit position-aligned `translate` map
       (deterministic and engine-portable, unlike locale-dependent
       ICU/NFKD normalizers whose tables drift between versions);
    4. collapse whitespace runs to single spaces and trim.

    Pure Column pipeline — scan-side map, no shuffle, no UDF; at 100 TB
    the scan partitioning is the parallelism. Emits the normalized text
    plus changed flag and char delta for pipeline monitoring.
    """
    text = F.col(text_col)
    step = F.regexp_replace(text, "[\\x00-\\x1f\\x7f-\\x9f]", " ")
    step = F.lower(step)
    step = F.translate(step, ACCENT_SRC, ACCENT_DST)
    step = F.trim(F.regexp_replace(step, "\\s+", " "))
    return df.select(
        F.col(id_col),
        step.alias("norm_text"),
        (step != text).cast("boolean").alias("changed"),
        (F.length(text) - F.length(step)).cast("bigint").alias("chars_removed"),
    )


def gopher_quality_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 25,
    min_stop_ratio: float = 0.02,
    max_dup_word_ratio: float = 0.6,
    max_top_word_ratio: float = 0.15,
    max_dup_bigram_ratio: float = 0.08,
) -> DataFrame:
    """Gopher-style composite quality GATE (Rae et al. 2021 shape): the
    document survives iff every rule holds; violated rules come back as
    a sorted `reasons` array so the pipeline can report WHY a document
    dropped (the audit column every production filter needs).

    Deliberately one scan (no self-join of component operators), with
    the token array STAGED as an intermediate projection: this gate
    references the tokens ~15 times including inside O(distinct_words)
    nested lambdas, and the inlined form re-tokenizes at every
    reference (57 `split(` sites in the physical plan, measured 2.5x
    slower). CollapseProject keeps a non-cheap alias with multiple
    uses, so the staged column tokenizes once per row. No shuffle, no
    UDF; ratios are integer counts + one double division, bit-portable
    like the component operators.

    Deliberately NOT widened via stats.fanout_parallel (r9 A/B,
    recorded in bench.py): on the one-file sf0.1 corpus the gate's
    whole single-threaded compute is ~0.5 s — too cheap to amortize
    the full-text payload shuffle the widening adds (isolated medians
    0.526 unwidened vs 0.693 widened). The widening rule needs
    per-partition compute >> payload-shuffle cost (repetition_stats at
    4.16 s single-threaded qualified; this gate does not).
    """
    staged = df.select(
        F.col(id_col), tokens_col(text_col).alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    top_count = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda w: F.size(F.filter(toks, lambda x: x == w)),
        )
    )
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    ng = F.size(grams)
    ndg = F.size(F.array_distinct(grams))
    en_stop = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*en_stop)))

    dup_word = F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0))
    top_word = F.when(n > 0, top_count / n).otherwise(F.lit(0.0))
    dup_bigram = F.when(ng > 0, (ng - ndg) / ng).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))

    checks = [
        (n < F.lit(min_words), "too_few_words"),
        (stop_ratio < F.lit(min_stop_ratio), "low_stopword_ratio"),
        (dup_word > F.lit(max_dup_word_ratio), "dup_words"),
        (top_word > F.lit(max_top_word_ratio), "dominant_word"),
        (dup_bigram > F.lit(max_dup_bigram_ratio), "dup_bigrams"),
    ]
    reasons = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(cond, F.lit(label)).otherwise(F.lit(None))
                    for cond, label in checks
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    return staged.select(
        F.col(id_col),
        n.cast("bigint").alias("n_words"),
        (F.size(reasons) == 0).alias("keep"),
        reasons.alias("reasons"),
    )
