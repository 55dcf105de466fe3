"""Streaming corpus prep: the per-row stages of the training-data prep
pipeline run as a Structured Streaming loop.

corpus_prep_v4 (queryset.py) is the batch form: normalize -> hashed
linear-classifier threshold -> Gopher gate -> exact dedup -> token-
budget selection. The first three stages are PER-ROW — each document's
verdict depends on nothing but the document — so they stream trivially:
a document feed drains per trigger (Trigger.AvailableNow for a daily
drop, continuous micro-batches for a firehose), and each micro-batch

  1. canonically normalizes the batch's text (llmdata.text.
     normalize_text),
  2. scores it with the broadcast weight relation (llmdata.classify.
     linear_classifier_scores — the model artifact rides along every
     micro-batch exactly as it rides along a corpus scan) and keeps
     docs whose exact BIGINT logit clears the threshold,
  3. applies the Gopher composite gate to the normalized text,
  4. writes the surviving (id, norm_text, logit_q) rows to a
     batch_id-partitioned parquet store.

The LAST TWO v4 stages (exact dedup's min-id survivor and the token-
budget selection) are CORPUS-GLOBAL — a duplicate group or the budget
cutoff can span micro-batches — so they do not belong in the per-batch
loop: run the batch operators over the accumulated store on the daily
cadence, or use the incremental signature-store loop
(streaming/dedup_stream.py) for the dedup stage. This split is the
standard production shape: cheap per-row filtering at ingest, global
passes over the filtered store.

v5 currency (r12 verdict #3): the batch v5 pipeline replaced the
whitespace-heuristic token count with the LEARNED tokenizer's count as
the budget/packing currency. Tokenizing is PER-ROW given a frozen
vocabulary, so it streams: pass ``merges`` (the ordered merge list —
load it ONCE per stream lifetime with tokenizer.frame_to_merges from
the persisted vocabulary relation, the same load-once artifact
contract as the bench shingles and the classifier weights) and each
micro-batch's surviving rows land with their learned ``n_tokens``.
The daily global pass then budgets and packs the accumulated store in
BPE tokens (quality_budget_select/assign_packs with
n_tokens_col="n_tokens") without ever re-tokenizing — exactly the
batch v5 stages over the store.

Delivery semantics: ALWAYS exactly-once. Unlike the dedup stream, this
sink maintains no cross-batch index — each batch's output rows derive
from that batch alone — so idempotence costs only the batch_id
partition column: a replayed micro-batch REWRITES exactly its own
partition (dynamic partition overwrite, shared with dedup_stream), and
there is no cheaper at-least-once mode worth offering.

Scale notes: every stage is a scan-side Column pipeline or one
map-side-combinable aggregate (the classifier's per-doc sum); the only
shuffles are the classifier's distinct-token featurization join and
the per-doc agg, both O(|batch|). The weight relation is O(n_features)
and broadcast. No state store, no watermark: nothing here is stateful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup_stream import _overwrite_batch_partition


def make_prep_batch_processor(
    weights: DataFrame,
    out_dir: str,
    n_features: int = 4096,
    logit_threshold: int = 0,
    bias_q: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_shingles: DataFrame | None = None,
    contamination_threshold: float = 0.0,
    ngram_n: int = 3,
    merges: list[tuple[str, str]] | None = None,
    encoder: str = "fold",
    pieces: list[tuple[str, float]] | None = None,
    ppl_max: float | None = None,
    token_pieces: list[tuple[str, float]] | None = None,
):
    """The foreachBatch body, exposed so tests can drive it directly
    (including replaying a (batch_df, batch_id) to exercise the
    replay-idempotence contract).

    ``weights``: (feature BIGINT, w_q BIGINT) — the model artifact
    (classify.hashed_weights stand-in, or the real trained relation).
    A doc survives iff logit_q >= logit_threshold AND the Gopher gate
    keeps it; survivors land in ``out_dir`` partitioned by batch_id.

    ``bench_shingles``: precomputed eval-set shingle relation
    (dedup.bench_shingle_set — compute+persist ONCE, outside the loop;
    it rides along every micro-batch as the broadcast side, the same
    artifact contract as ``weights``). When given, the decontamination
    stage (dedup.decontaminate on the normalized text) runs between
    normalization and the classifier/gate predicates — contamination,
    like the classifier verdict, is PER-ROW given the fixed eval set,
    so it streams without state. ``contamination_threshold`` as in
    decontaminate (default 0.0 = the strict drop-on-any-overlap rule).

    ``merges``: the frozen learned vocabulary (ordered merge list) —
    when given, each surviving row is tokenized over the NORMALIZED
    text with bpe_apply (distinct-word fold + join-back; token arrays
    never materialize) and the store row gains its learned
    ``n_tokens`` BIGINT, the v5 budget/packing currency (module
    docstring). Load it once per stream lifetime
    (tokenizer.frame_to_merges) — it is a driver-side O(vocab) list,
    never data-scale. ``encoder`` as in bpe_apply ("fold" default;
    "vectorized" for production vocabularies past ~hundreds of
    merges) — with ONE streaming override: a merge list longer than
    the fold path's checkpoint-free depth (tokenizer.
    DEFAULT_ENCODE_CHUNK, 64) is routed to the vectorized encoder
    even when "fold" was asked for. Bit-identical output, but it is a
    mapInPandas stage — executors need pandas/pyarrow — because the
    fold path past that depth checkpoints inside every micro-batch
    (the per-batch leak + sibling-release hazard in the body comment).

    ``pieces`` + ``ppl_max``: the CCNet-shaped LM gate — the frozen
    unigram-LM artifact (load once per stream lifetime with
    unigram.frame_to_pieces, the same contract as ``merges``) scores
    each document's perplexity over the normalized text, and only rows
    with ppl <= ppl_max survive. Perplexity, like the classifier
    verdict, is PER-ROW given the frozen model, so it streams without
    state; survivors keep their ``ppl`` DOUBLE in the store row (CCNet
    buckets the crawl by this number) alongside logit_q. Both
    arguments are required together — a model without a threshold (or
    vice versa) raises rather than silently gating nothing.

    ``token_pieces``: the unigram-LM vocabulary as the learned token
    CURRENCY (r13 pinned unigram counts as a drop-in budget/packing
    currency batch-side; this is the streaming half): when given, each
    surviving row's ``n_tokens`` comes from unigram_apply (Viterbi over
    the frozen pieces) instead of BPE — same load-once-per-stream-
    lifetime artifact contract as ``merges`` (unigram.frame_to_pieces),
    same survivors-only join-back, same store schema. Mutually
    exclusive with ``merges`` (one currency per store — mixing
    vocabularies would make the budget column incomparable across
    batches); independent of the ``pieces`` GATE artifact, which may be
    the same list (score with it AND count with it) or absent.
    """
    from ..llmdata.classify import linear_classifier_scores
    from ..llmdata.dedup import decontaminate
    from ..llmdata.text import gopher_quality_gate, normalize_text
    from ..llmdata.tokenizer import DEFAULT_ENCODE_CHUNK, bpe_apply
    from ..llmdata.unigram import unigram_apply, unigram_doc_perplexity

    if (pieces is None) != (ppl_max is None):
        raise ValueError(
            "pieces and ppl_max come together: the LM gate needs both "
            "the frozen model and its threshold"
        )
    if merges is not None and token_pieces is not None:
        raise ValueError(
            "merges and token_pieces are mutually exclusive: one token "
            "currency per store — n_tokens counted under two "
            "vocabularies would be incomparable across batches"
        )

    # a merge list past the fold path's checkpoint trigger
    # (DEFAULT_ENCODE_CHUNK — the same constant that decides it inside
    # encode_words, so retuning one retunes both) would eagerly
    # localCheckpoint the word table INSIDE every micro-batch and
    # register it with the global deferred-release registry — a
    # per-batch block leak in a loop that (by the module's stream-
    # lifetime-artifact contract) never calls release_tracked, and a
    # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND hazard if a sibling loop's
    # per-batch release fires mid-plan (r13 review). The vectorized
    # encoder is bit-identical for the sequential strategy (pytest
    # parity) and checkpoints nothing — route long vocabularies there.
    if merges is not None and encoder == "fold" and len(merges) > DEFAULT_ENCODE_CHUNK:
        encoder = "vectorized"

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        normed = normalize_text(batch_df, text_col=text_col, id_col=id_col)
        scoped = scoped_kept = None
        if bench_shingles is not None:
            # normed feeds THREE branches of the per-batch plan (the
            # classifier, the gate, and the kept projection); the
            # decontamination subtree (shingle explode + per-doc agg +
            # anti-join) is the first shuffle-heavy stage in that shared
            # subtree, so persist the decontaminated batch — scoped
            # .persist()/.unpersist(), NOT tracked_persist: a global
            # release here would also drop the stream-lifetime
            # bench_shingles cache (and any sibling loop's caches)
            normed = scoped = decontaminate(
                normed,
                None,
                threshold=contamination_threshold,
                id_col=id_col,
                text_col="norm_text",
                n=ngram_n,
                bench_shingles=bench_shingles,
            ).persist()
        try:
            clf = linear_classifier_scores(
                normed,
                weights,
                n_features=n_features,
                bias_q=bias_q,
                id_col=id_col,
                text_col="norm_text",
            )
            gated = gopher_quality_gate(normed, text_col="norm_text", id_col=id_col)
            kept = (
                normed.join(
                    clf.filter(F.col("logit_q") >= int(logit_threshold)).select(
                        id_col, "logit_q"
                    ),
                    id_col,
                )
                .join(gated.filter("keep").select(id_col), id_col)
                .select(id_col, "norm_text", "logit_q")
            )
            if pieces is not None or merges is not None or token_pieces is not None:
                # LM scoring / tokenizing touch kept through several
                # plan branches, and its subtree carries the classifier
                # featurization join — scoped persist like the
                # decontamination branch above, NOT tracked_persist
                # (same sibling-loop release hazard)
                kept = scoped_kept = kept.persist()
            if pieces is not None:
                # the LM gate joins like the classifier/Gopher gates,
                # and like the tokenize stage it scores SURVIVORS only
                # (r13 review: scoring `normed` paid the forward pass
                # for rows the cheaper gates had already rejected; the
                # join is an intersection, so the output is identical).
                # Survivors keep the score (CCNet's bucketing column);
                # NULL ppl (empty text) fails ppl <= max, matching the
                # batch operator's gate-friendly convention
                lm = unigram_doc_perplexity(
                    kept, pieces, text_col="norm_text", id_col=id_col
                )
                kept = kept.join(
                    lm.filter(F.col("ppl") <= float(ppl_max)).select(id_col, "ppl"),
                    id_col,
                )
            if merges is not None or token_pieces is not None:
                # tokenize SURVIVORS only (the gates already paid for
                # themselves); n_tokens join-back keeps token arrays
                # out of the store. Both currencies land the identical
                # apply_word_encoder frame, so the store schema does
                # not depend on which vocabulary counts the tokens.
                toked = (
                    bpe_apply(
                        kept,
                        merges,
                        text_col="norm_text",
                        id_col=id_col,
                        encoder=encoder,
                    )
                    if merges is not None
                    else unigram_apply(
                        kept, token_pieces, text_col="norm_text", id_col=id_col
                    )
                )
                kept = kept.join(toked.select(id_col, "n_tokens"), id_col)
            _overwrite_batch_partition(kept, batch_id, out_dir)
        finally:
            if scoped_kept is not None:
                scoped_kept.unpersist()
            if scoped is not None:
                scoped.unpersist()

    return _process


def prepare_bench_shingles(
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 3,
) -> DataFrame:
    """Build + persist the decontamination artifact for the prep loop:
    the eval set canonically normalized (the same normalize_text the
    loop applies to every batch — contamination must compare in one
    normalized space), collapsed to its distinct shingle relation.

    The returned frame is ``.persist()``ed and CALLER-OWNED: unpersist
    it when the stream(s) using it are done. Plain persist, NOT
    tracked_persist — sibling foreachBatch loops (the dedup stream's
    processors) call the global release_tracked() per batch, and a
    tracked entry would be dropped by the first batch of any co-running
    loop, silently re-shingling the benchmark every batch after."""
    from ..llmdata.dedup import bench_shingle_set
    from ..llmdata.text import normalize_text

    return bench_shingle_set(
        normalize_text(bench, text_col=text_col, id_col=id_col),
        text_col="norm_text",
        id_col=id_col,
        n=ngram_n,
    ).persist()


def corpus_prep_stream(
    docs_stream: DataFrame,
    weights: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n_features: int = 4096,
    logit_threshold: int = 0,
    bias_q: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench: DataFrame | None = None,
    bench_shingles: DataFrame | None = None,
    contamination_threshold: float = 0.0,
    ngram_n: int = 3,
    merges: list[tuple[str, str]] | None = None,
    encoder: str = "fold",
    pieces: list[tuple[str, float]] | None = None,
    ppl_max: float | None = None,
    token_pieces: list[tuple[str, float]] | None = None,
):
    """docs stream (id, text) -> foreachBatch writer appending each
    micro-batch's surviving (id, norm_text, logit_q) rows — plus the
    learned n_tokens when ``merges`` or ``token_pieces`` is given (the
    v5 currency, module docstring) — to a batch_id-partitioned store
    (replay-idempotent).
    ``merges``/``encoder`` as in make_prep_batch_processor, including
    its long-vocabulary override: past DEFAULT_ENCODE_CHUNK merges the
    vectorized (mapInPandas) encoder runs even under encoder="fold".
    ``pieces``/``ppl_max`` as there too: the frozen unigram-LM
    perplexity gate — survivors carry their ppl DOUBLE in the store.
    ``token_pieces`` as there: the unigram vocabulary as the n_tokens
    currency instead of BPE (mutually exclusive with ``merges``).

    Decontamination, two ways to enable it:

    - ``bench_shingles``: a prepared artifact from
      :func:`prepare_bench_shingles` — CALLER-OWNED cache, the right
      path for a long-lived session running many daily drops (one
      artifact serves every stream; the caller unpersists it when
      done).
    - ``bench``: convenience for one-stream sessions — the eval docs
      are normalized + shingled + persisted here ONCE; that internal
      cache has no release handle and lives until the SparkSession
      ends, so repeated corpus_prep_stream(bench=...) calls in one
      session accumulate one pinned cache each (use the artifact path
      instead).

    Either way, every micro-batch's decontamination is one broadcast
    join against the cached set — never a re-shingle of the benchmark.

    Returns the un-started DataStreamWriter so the caller picks the
    trigger (``.trigger(availableNow=True)`` for the daily drop) and
    starts it.
    """
    if bench is not None and bench_shingles is None:
        bench_shingles = prepare_bench_shingles(bench, text_col, id_col, ngram_n)
    _process = make_prep_batch_processor(
        weights,
        out_dir,
        n_features,
        logit_threshold,
        bias_q,
        text_col,
        id_col,
        bench_shingles=bench_shingles,
        contamination_threshold=contamination_threshold,
        ngram_n=ngram_n,
        merges=merges,
        encoder=encoder,
        pieces=pieces,
        ppl_max=ppl_max,
        token_pieces=token_pieces,
    )
    return docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
