"""Learned-vocabulary tokenizer: distributed BPE training + apply.

The one LLM-pipeline capability the engine previously lacked (r10
verdict stretch #7): `text.token_stats` counts tokens with a fixed
heuristic, but nothing LEARNS a vocabulary. Byte-pair encoding
(Sennrich et al., ACL'16) is the standard: start from characters,
repeatedly merge the most frequent adjacent symbol pair, and the
ordered merge list IS the vocabulary artifact.

Scale shape — the classic scalable-BPE factoring:

- Training never iterates over the corpus. One corpus scan builds the
  WORD FREQUENCY TABLE (distinct word → count); natural-language
  corpora have ~10^7-10^8 distinct words at 100 TB, so the word table
  is the small relation every merge round works on. Each round is one
  pair-explode + hash-agg over the word table plus a top-1 collect
  (O(1) driver rows — the same driver-loop contract as Lloyd
  iterations in ivf.py and the CC rounds in clusters.py), then one
  column rewrite of the symbol arrays. Symbol arrays shrink
  monotonically, so rounds get cheaper as training proceeds.
- The merge fold is a JVM-side `aggregate` over the symbol array (no
  Python stage): greedy left-to-right, the original BPE semantics —
  [a a a] under merge (a,a) becomes [aa a], because after a merge the
  accumulator tail is the merged symbol and no longer matches `l`.
- Apply encodes DISTINCT words only (ONE doubly-nested aggregate per
  projection folding the merge list as data — JVM-side but INTERPRETED:
  higher-order functions are CodegenFallback, a fact measured in r12's
  jstack and the reason the vectorized mapInPandas twin exists for
  production vocabularies) and joins the
  encodings back to the token stream — repeated words are never
  re-encoded, the same distinct-side trick the classifier's
  featurizer uses. Document reassembly is one ordered hash-agg per
  doc (array_sort over collected (pos, toks) structs, then flatten).

Determinism: ties on pair count break by (left, right) lexicographic
ascending — a total order, so the learned merge list is identical
across partitionings and engines (pytest pins parity against a plain
python reference).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from ..caching import release_local_checkpoint, tracked_checkpoint_release
from .text import tokens_col

# chars -> symbol array; (?!^)(?!$) splits between every pair of
# characters without matching at the string boundaries (a bare (?!^)
# also matches at end-of-string, and Java split's -1 limit then keeps
# the trailing empty symbol)
_SYMS = "split(word, '(?!^)(?!$)')"


def word_frequency_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, syms) — the relation BPE training iterates on.
    One corpus scan, one hash-agg; `syms` starts as the character
    split."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.expr(_SYMS))
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into
    left+right — one JVM-side aggregate, no Python. This is the
    single-merge REFERENCE form; production paths fold the whole merge
    list as data in one expression (_merge_fold_all, r18) — same inner
    fold, constant-depth analysis. Overlapping runs
    merge non-overlapping from the left ([a a a] -> [aa a]) because the
    merged tail symbol no longer equals `left` (left+right != left for
    nonempty right).

    The empty-accumulator guard is F.get (0-indexed, NULL on any
    out-of-range index in EVERY mode) rather than element_at(acc, -1):
    Spark's AND does not short-circuit and element_at throws
    INVALID_ARRAY_INDEX under ANSI mode (the Spark 4 default), so the
    element_at form only worked under this repo's pinned
    ansi.enabled=false session (advisor r11). NULL == left is NULL and
    `when` treats NULL as false, so the first symbol of every word
    falls through to the append branch with no size() predicate at
    all — one fewer comparison per fold step, which matters when a
    production merge list chains thousands of steps."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _merge_fold_all(syms: Column, merges: list[tuple[str, str]]) -> Column:
    """Every merge of ``merges`` applied IN ORDER with ONE doubly-nested
    aggregate: the merge list enters the plan as DATA — an
    array<struct<l,r,o>> literal the outer lambda folds over, running
    the same greedy inner fold as :func:`_merge_fold` per element
    (o = left+right, precomputed so the hot branch appends a plain
    field instead of concatenating). Chaining one nested ``aggregate``
    per merge instead costs Catalyst a fixed-point Resolution iteration
    PER NESTING LEVEL, so analysis grows superlinearly with the merge
    count — measured r18 on the driver word table: analyze 0.47 s at
    depth 8 / 2.95 s at depth 64 chained, vs 0.08-0.14 s at ANY depth
    here, with the end-to-end encode action 0.43 s → 0.17 s at the
    8-merge oracle depth. Bit-identical to the chained form (same
    per-merge fold, same order; pytest parity + the fuzz test vs
    _py_fold_merges).

    The literal is ONE parsed expression (the lit_double_array
    precedent — F.lit per symbol costs a py4j round trip each); symbols
    outside the tokenizer's [a-z0-9]+ contract fall back to the
    per-element builder rather than risking SQL-literal escaping."""
    if all(_SQL_SAFE_SYM.fullmatch(s) for l, r in merges for s in (l, r)):
        pairs = F.expr(
            "array("
            + ",".join(
                f"named_struct('l','{l}','r','{r}','o','{l}{r}')"
                for l, r in merges
            )
            + ")"
        )
    else:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(l).alias("l"), F.lit(r).alias("r"), F.lit(l + r).alias("o")
                )
                for l, r in merges
            ]
        )
    return F.aggregate(
        pairs,
        syms,
        lambda cur, m: F.aggregate(
            cur,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.get(acc, F.size(acc) - 1) == m.getField("l"))
                & (x == m.getField("r")),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(m.getField("o"))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ),
    )


# symbols that embed verbatim in a SQL string literal; the token
# contract is [a-z0-9]+ so real vocabularies always pass
_SQL_SAFE_SYM = re.compile(r"[a-z0-9]+")


def _pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, cnt) adjacent-pair frequencies over the word table,
    weighted by word frequency."""
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"
    )
    return (
        words.filter(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


# Batched rounds scan the top (batch_k * this) snapshot pairs when
# greedily picking symbol-disjoint merges; a shared named constant so
# the plain-python parity reference in tests mirrors the exact rule.
CANDIDATE_FACTOR = 8


def select_disjoint(
    cands: list[tuple[str, str, int]], batch_k: int
) -> list[tuple[str, str]]:
    """Greedy selection of up to ``batch_k`` mutually-independent merge
    pairs from a (cnt desc, l, r asc)-ordered candidate snapshot — the
    driver-side half of a batched BPE round, factored out so the pytest
    reference runs the IDENTICAL rule.

    Independence rule: a candidate is skipped if its left, right, or
    OUTPUT (left+right) symbol collides with any previously selected
    pair's left/right/output. Disjoint l/r keeps every selected pair's
    corpus count invariant while the earlier picks apply (merging (a,b)
    only touches counts of pairs containing a or b); excluding outputs
    closes the one leak in that argument — a later pair naming an
    earlier pick's output symbol (possible: multi-char symbols exist
    from prior rounds) would see NEW instances of that symbol created
    mid-batch, so its true count at merge time would exceed the
    snapshot count it was ranked by."""
    used: set[str] = set()
    picked: list[tuple[str, str]] = []
    for l, r, _ in cands:
        if len(picked) == batch_k:
            break
        if l in used or r in used or (l + r) in used:
            continue
        picked.append((l, r))
        used.update((l, r, l + r))
    return picked


def bpe_train(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_pair_count: int = 2,
    batch_k: int = 1,
    rewriter: str = "fold",
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus.

    Stops early when no pair reaches ``min_pair_count`` (merging a
    pair seen once memorizes noise). Each round localCheckpoints the
    rewritten word table so lineage stays O(1) across rounds (the CC
    loop's contract); the table is tiny relative to the corpus, so the
    checkpoint cost is the explicit round barrier, not data volume.

    ``batch_k`` (r11 verdict #3 — the standard fast-BPE factoring):
    merge up to k mutually-independent pairs per round instead of one,
    collapsing a production 32k-vocab train from ~32k sequential
    pair-agg/collect/rewrite job rounds to ~32k/k. Per round the top
    ``batch_k * CANDIDATE_FACTOR`` snapshot pairs are collected
    (O(k) driver rows — still the Lloyd-iteration contract) and up to k
    symbol-disjoint pairs are greedily selected (:func:`select_disjoint`
    — the selection rule guarantees each selected pair's corpus count
    at its merge turn equals its snapshot count, so no pair is ever
    merged on a stale rank). ``batch_k=1`` is EXACTLY the strict
    sequential BPE semantics (pytest-pinned against the plain-python
    reference).

    Where k>1 can diverge from strict BPE: merging the round's top pair
    creates NEW pairs containing the merged symbol, and such a pair can
    out-count the round's remaining picks; strict BPE would merge it
    immediately, the batched round defers it until the next snapshot.
    Divergence is bounded to exactly that deferral — every pair a batch
    merges was, at the round snapshot, at least as frequent as every
    later pick in the same batch and ≥ min_pair_count (pytest pins both
    the bound and exact parity against a batched python reference).

    ``rewriter``: how each round rewrites the word table's symbol
    arrays. "fold" (default) chains k _merge_fold expressions — no
    Python stage, right at oracle scales; "vectorized" applies the
    round's picks with the shared python fold over Arrow batches
    (_py_fold_merges — bit-identical, pytest parity). Measured r12 at
    100k distinct words: the expression rewrite is interpreted
    ArrayAggregate eval and costs ~8 s/round, the dominant term of a
    506 s 1024-merge train; the vectorized rewrite is the same >10×
    win as encode_words_vectorized. batch_k is capped at
    _MAX_FOLD_CHAIN for the fold rewriter (deeper chains fail Catalyst
    ANALYSIS — measured; the vectorized rewriter has no such ceiling).

    _pair_counts DECISION (r12 verdict #5, measured r13 on the same
    100k-word hex corpus, 1024 merges, batch_k=16, vectorized
    rewriter, canary 0.714/0.554): 81 rounds total ~82 s, split
    pair-count+top-k-collect 35.6 s vs rewrite+checkpoint 44.4 s —
    the per-round pair aggregation is ~44% of round time, ROUGHLY
    BALANCED with the rewrite, not dominant. An Arrow-batched
    pair-count twin could at best halve its share (~20% end-to-end)
    while adding a second python path to keep bit-identical with the
    explode+hash-agg the oracles pin — not built; re-measure if the
    word table's symbol arrays ever get long enough (document-level
    BPE, not word-level) to move the explode cost superlinearly."""
    if batch_k < 1:
        raise ValueError(f"batch_k must be >= 1, got {batch_k}")
    if rewriter not in ("fold", "vectorized"):
        raise ValueError(f"unknown rewriter {rewriter!r}: use 'fold' or 'vectorized'")
    # the rewrite chain's depth is min(batch_k, n_merges) picks per
    # round at most — a large batch_k over a small total is shallow
    if rewriter == "fold" and min(batch_k, n_merges) > _MAX_FOLD_CHAIN:
        raise ValueError(
            f"batch_k={batch_k} would chain >{_MAX_FOLD_CHAIN} merge folds "
            "per round — past the analyzer ceiling (measured r12: nested "
            "higher-order aggregates past ~100 fail Catalyst's Resolution "
            "fixed point); use rewriter='vectorized' for larger batches"
        )
    words = word_frequency_table(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    try:
        while len(merges) < n_merges:
            k = min(batch_k, n_merges - len(merges))
            top = (
                _pair_counts(words)
                .filter(F.col("cnt") >= min_pair_count)
                .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(k * CANDIDATE_FACTOR if k > 1 else 1)
                .collect()
            )
            if not top:
                break
            picked = select_disjoint([(t.l, t.r, t.cnt) for t in top], k)
            merges.extend(picked)
            if rewriter == "vectorized":
                rewritten = _rewrite_syms_vectorized(words, picked)
            else:
                rewritten = words.withColumn(
                    "syms", _merge_fold_all(F.col("syms"), picked)
                )
            nxt = rewritten.localCheckpoint()
            # release_local_checkpoint, NOT DataFrame.unpersist: the
            # latter never frees checkpoint blocks (caching.py), so the
            # swap would pin every round's word table until JVM GC
            release_local_checkpoint(words)
            words = nxt
    finally:
        release_local_checkpoint(words)
    return merges


def _rewrite_syms_vectorized(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """One train round's symbol-array rewrite as an Arrow-batched
    python fold (schema-preserving mapInPandas over the word table) —
    bit-identical to the chained _merge_fold expressions via the shared
    _py_fold_merges body."""
    ms = list(merges)
    schema = words.schema

    def _go(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["syms"] = [
                None if s is None else _py_fold_merges(list(s), ms)
                for s in pdf["syms"]
            ]
            yield pdf

    return words.mapInPandas(_go, schema=schema)


# Default merge count per fold-chain projection in encode_words — the
# PUBLIC face of the checkpoint trigger: a merge list longer than this
# makes the fold path localCheckpoint per chunk (and register the last
# one destructively). Callers that must avoid in-plan checkpoints (the
# streaming prep loop) key their encoder routing off THIS constant, so
# retuning it retunes them with it. Distinct from _MAX_FOLD_CHAIN (the
# measured analyzer ceiling, a hard error bound): chunk can be lowered
# below the ceiling for perf, never raised above it.
DEFAULT_ENCODE_CHUNK = 64


def encode_words(
    words: DataFrame, merges: list[tuple[str, str]], chunk: int = DEFAULT_ENCODE_CHUNK
) -> DataFrame:
    """Add `toks` (the BPE encoding) to a relation carrying a `word`
    column: character split, then every merge applied IN ORDER.

    Each ``chunk``-sized slice of the merge list is applied as ONE
    data-driven fold (_merge_fold_all, r18) — constant-depth analysis,
    so the old nested-per-merge Catalyst blowup no longer applies to a
    slice. The chunk/checkpoint machinery is RETAINED as the pinned
    contract for >chunk lists (runtime per-row cost still grows with
    the merge count — the vectorized encoder stays the production-vocab
    answer) and every ``chunk`` merges the partial encoding is
    localCheckpointed — a real optimizer barrier. The
    checkpointed relation is the DISTINCT-WORD table (bpe_apply's
    contract), so the materialization cost is vocabulary-sized, not
    corpus-sized; with merges <= chunk (the common case and every
    oracle path) no checkpoint happens and the encoding stays one pure
    expression projection (no Python stage; interpreted eval — see the
    module docstring and encode_words_vectorized for where that
    ceases to be the right trade).

    Each localCheckpoint is EAGER, so once the next chunk's checkpoint
    materializes its predecessor's blocks are dead weight — they are
    unpersisted immediately (bpe_train's words/nxt swap; advisor r11:
    without this a k-merge list pinned ceil(k/chunk)-1 block-manager
    copies of the word table until session end). The LAST checkpoint
    backs the returned frame, so it registers with the deferred-release
    registry instead (caching.tracked_checkpoint_release): the harness
    release after the caller's terminal action frees it — with the
    documented checkpoint edge that the frame cannot be re-collected
    after that release.

    A >chunk merge list also REPARTITIONS the word table first
    (measured r12, jstack on a 100k-word × 1024-merge encode): the
    distinct-word shuffle is small, so AQE coalesces it to ONE
    partition — and the fold chain is compute-dominated (interpreted
    ArrayAggregate.eval at this nesting depth — nested higher-order
    functions are CodegenFallback, not codegen), so the whole encode
    serialized onto a single core (1000+ s of CPU on one task). This is
    exactly the recorded fanout-widening bar (≳1 s per input split,
    compute-dominated single scan). At ≤chunk merges (every oracle
    path) nothing changes — no shuffle, no barrier, one projection.

    CHUNK POLICY (r12 recorded A/B, 99,705 distinct words × 1024
    merges, widened, local[32], canary 0.75): chunk=32 read 78–85 s
    and chunk=64 77–84 s — within noise of each other — while
    chunk=128 FAILED ANALYSIS outright under the then-chained fold
    ("Max iterations (100) reached for batch Resolution"). The r18
    data-driven fold removed that analyzer wall, but 64 stays the
    default and the _MAX_FOLD_CHAIN guard stays the pinned contract
    (the registry is frozen and nothing needs deeper slices): the real
    production-vocab decision is not chunk at all —
    encode_words_vectorized ran the same workload in 6.2 s (≈13×) —
    use it past ~hundreds of merges."""
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    # the actual per-projection depth is min(chunk, len(merges)) — a
    # large chunk over a small merge list builds a shallow, safe chain
    if min(chunk, len(merges)) > _MAX_FOLD_CHAIN:
        raise ValueError(
            f"chunk={chunk} with {len(merges)} merges would build a "
            f">{_MAX_FOLD_CHAIN}-deep fold chain — past the analyzer "
            "ceiling (measured r12: a 128-deep chain fails Catalyst "
            "Resolution); use encode_words_vectorized for production "
            "vocabularies instead of raising chunk"
        )
    if len(merges) > chunk:
        words = words.repartition(words.sparkSession.sparkContext.defaultParallelism)
    out = words.withColumn("toks", F.expr(_SYMS))
    prev_ckpt: DataFrame | None = None
    for i in range(0, len(merges), chunk):
        # merge-list-as-data fold (_merge_fold_all): constant-depth
        # analysis regardless of the slice length (r18; the chained
        # per-merge form cost Catalyst a Resolution iteration per level)
        out = out.withColumn("toks", _merge_fold_all(F.col("toks"), merges[i : i + chunk]))
        if i + chunk < len(merges):
            out = out.localCheckpoint()
            if prev_ckpt is not None:
                release_local_checkpoint(prev_ckpt)
            prev_ckpt = out
    if prev_ckpt is not None:
        # labeled so caching.last_destructive_release names this entry
        # after the harness release — the ONE registry path whose
        # released frame cannot be re-collected (advisor r12)
        tracked_checkpoint_release(prev_ckpt, label="encode_words>chunk")
    return out


# Ceiling on merges applied per projection. Historically an ANALYZER
# hard wall (measured r12: a 128-deep chained higher-order aggregate
# failed Resolution — each nested lambda cost the analyzer a fixed-point
# iteration); the r18 merge-list-as-data fold (_merge_fold_all) analyzes
# at constant depth, so the ceiling is now a RETAINED compatibility
# bound (pinned by tests, harmless at 64, and the error message's
# advice — use the vectorized encoder for production vocabularies —
# remains the right runtime call regardless of analysis cost).
_MAX_FOLD_CHAIN = 64


def _py_fold_merges(
    syms: list[str], merges: list[tuple[str, str]]
) -> list[str]:
    """The sequential-greedy merge fold in plain python — bit-identical
    to chained _merge_fold expressions (pytest parity), with a cheap
    applicability screen (skip merges whose symbols aren't in the
    current symbol set; stale set entries only cost a scan, never a
    wrong result). Shared by the vectorized encoder and the vectorized
    train rewriter so the two python paths cannot drift."""
    present = set(syms)
    for l, r in merges:
        if l not in present or r not in present:
            continue
        out: list[str] = []
        for x in syms:
            if out and out[-1] == l and x == r:
                out[-1] = l + r
            else:
                out.append(x)
        syms = out
        present = set(syms)
    return syms


def _py_rank_priority_merges(
    syms: list[str], ranks: dict[tuple[str, str], int]
) -> list[str]:
    """HF/GPT-2-style BPE encode: repeatedly merge the LOWEST-RANK
    adjacent pair present anywhere in the word (all non-overlapping
    occurrences, left to right) until no ranked pair remains. Unlike
    the sequential fold (:func:`_py_fold_merges`, one pass per merge in
    merge order), this re-applies an EARLY merge to adjacencies a later
    merge creates — the semantics of the GPT-2 `bpe()` loop and HF
    tokenizers. The two strategies agree on every merge list a
    bpe_train run can produce on a word where each merge's operands
    predate it, but diverge on crafted/imported rank tables (pytest
    pins a divergence fixture).

    Cost shape: O(passes × word length) with a dict probe per
    adjacency — the same per-word working set as the sequential fold;
    rank lookup is O(1) so a production-size rank table costs nothing
    per pair."""
    while len(syms) > 1:
        best_rank: int | None = None
        best: tuple[str, str] | None = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        l, r = best
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_words_vectorized(
    words: DataFrame,
    merges: list[tuple[str, str]],
    strategy: str = "sequential",
) -> DataFrame:
    """The PRODUCTION-VOCABULARY twin of :func:`encode_words`: the same
    sequential-greedy fold, computed by an Arrow-batched python loop
    over the distinct-word table (mapInPandas) instead of a chained
    Catalyst expression — bit-identical output (pytest parity).

    Why it exists (measured r12, jstack mid-run): at ~1k merges the
    expression chain evaluates as INTERPRETED ``ArrayAggregate.eval``
    (nested higher-order functions are CodegenFallback — the depth-32
    recursive eval frames are visible in the thread dump), costing
    1000+ s of CPU for 100k words × 1024 merges. The python fold does
    the identical work at honest interpreter speed with a cheap
    per-merge applicability screen (skip merges whose symbols aren't in
    the word's symbol set — at production vocab sizes almost every
    merge is skipped per word), distributed over Arrow batches. The
    expression path stays the default for ≤~hundreds of merges: no
    Python stage, no Arrow boundary, and every SQL-oracle path uses it.

    Strategy (r12 verdict #3 — a DOCUMENTED variant, not a silent
    semantic):

    - ``"sequential"`` (default): replay merges IN ORDER, one greedy
      left-to-right pass per merge — the fold the expression chain
      computes and every oracle path pins. An early merge never sees
      an adjacency a later merge creates.
    - ``"rank_priority"``: the HF/GPT-2 encode — repeatedly apply the
      lowest-rank pair present anywhere in the word until fixed point
      (:func:`_py_rank_priority_merges`). Matches production BPE
      libraries on imported vocabularies; diverges from sequential on
      rank tables where an early-rank merge consumes a token a
      later-rank merge creates (pytest divergence fixture). Vectorized
      path only — the expression chain does not support it (a
      fixed-point loop has no bounded fold depth)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    if strategy not in ("sequential", "rank_priority"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use 'sequential' or 'rank_priority'"
        )
    ms = list(merges)
    rank_priority = strategy == "rank_priority"
    # rank table only for the strategy that reads it — the sequential
    # closure must not ship a second O(vocab) structure to every task
    # (r13 review). First occurrence wins on a (malformed) duplicated
    # pair — the lowest rank is the one rank-priority must honor.
    ranks: dict[tuple[str, str], int] = {}
    if rank_priority:
        for i, pair in enumerate(ms):
            ranks.setdefault(pair, i)
    schema = StructType(
        list(words.schema.fields) + [StructField("toks", ArrayType(StringType()))]
    )

    def _encode_batches(batches):
        # no memo dict: the documented input is the DISTINCT-word
        # table, where a cache can never hit and only doubles the
        # partition's resident encoding memory (r12 review)

        def enc(word):
            if word is None:
                return None
            # split('', '(?!^)(?!$)') yields [''] — match the
            # expression path's empty-word form exactly
            syms = list(word) if word else [""]
            if rank_priority:
                return _py_rank_priority_merges(syms, ranks)
            return _py_fold_merges(syms, ms)

        for pdf in batches:
            pdf = pdf.copy()
            pdf["toks"] = [enc(w) for w in pdf["word"]]
            yield pdf

    return words.mapInPandas(_encode_batches, schema=schema)


def merges_to_frame(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned vocabulary as a persistable relation
    (merge_idx, left, right) — the same write-once/read-forever artifact
    contract as the MinHash band store and the embedding bucket store:
    bpe_train once, write the frame to parquet, and every later
    apply/stream loads it. ORDER IS THE MODEL — merge_idx preserves it
    across the (unordered) parquet round-trip."""
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "merge_idx bigint, left string, right string",
    )


def frame_to_merges(df: DataFrame) -> list[tuple[str, str]]:
    """Inverse of :func:`merges_to_frame`: reload the ordered merge
    list from its persisted relation (a driver-side artifact read —
    vocabularies are O(10k) rows, never data-scale)."""
    return [
        (r.left, r.right)
        for r in df.select("merge_idx", "left", "right")
        .orderBy("merge_idx")
        .collect()
    ]


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    encoder: str = "fold",
    strategy: str = "sequential",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list →
    (id, tokens array<string>, n_tokens BIGINT), one row per input doc
    (empty/NULL text keeps a row with an empty token array).

    The encode runs over DISTINCT words only; the token stream joins
    the encodings back by word, and documents reassemble with one
    ordered hash-agg (array_sort over (pos, toks) structs — dense
    posexplode positions make row order recoverable without a window).

    ``encoder``: "fold" (default — the Catalyst expression chain, no
    Python stage; right for the ≤~hundreds-of-merges vocabularies every
    oracle path uses) or "vectorized" (the Arrow-batched python fold —
    the production-vocabulary path; see encode_words_vectorized for the
    measured crossover). Both are bit-identical (pytest parity).

    ``strategy``: "sequential" (default — the fold semantics every
    oracle pins) or "rank_priority" (HF/GPT-2 fixed-point encode;
    vectorized only — see encode_words_vectorized). Every registry
    entry uses sequential; rank_priority exists for imported
    production vocabularies whose published semantics are the
    fixed-point loop.
    """
    if encoder not in ("fold", "vectorized"):
        raise ValueError(f"unknown encoder {encoder!r}: use 'fold' or 'vectorized'")
    # strategy VALUE first, compatibility second (r13 review: a typo'd
    # strategy under the default encoder used to earn the misleading
    # "switch to vectorized" advice, then fail again there)
    if strategy not in ("sequential", "rank_priority"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use 'sequential' or 'rank_priority'"
        )
    if strategy != "sequential" and encoder != "vectorized":
        raise ValueError(
            f"strategy {strategy!r} needs encoder='vectorized' — the "
            "expression chain only computes the sequential fold"
        )
    if encoder == "fold":
        encode = lambda words: encode_words(words, merges)  # noqa: E731
    else:
        encode = lambda words: encode_words_vectorized(  # noqa: E731
            words, merges, strategy=strategy
        )
    return apply_word_encoder(docs, encode, text_col, id_col)


def apply_word_encoder(
    docs: DataFrame,
    encode,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The tokenize-apply frame every learned tokenizer shares (BPE and
    unigram): posexplode the token stream, run ``encode`` — a
    (word) → (word, toks array<string>) DataFrame function — over the
    DISTINCT-word table only, join the encodings back, and reassemble
    each document with one ordered hash-agg (array_sort over
    (pos, toks) structs — dense posexplode positions make row order
    recoverable without a window). Empty/NULL text keeps its row with
    an empty token array; n_tokens is BIGINT for oracle-schema parity."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens_col(text_col)).alias("pos", "word"),
    )
    encoded = encode(toks.select("word").distinct())
    per_doc = (
        toks.join(encoded, "word")
        .groupBy("doc")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                    lambda s: s.getField("toks"),
                )
            ).alias("tokens")
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("bigint"))
    )
