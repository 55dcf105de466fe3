"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
functions over `mapInPandas` — the only place Python belongs in the
pipeline, because codec work genuinely can't be expressed in SQL.

The decode step itself is STUBBED (no image/audio libraries in this
environment): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (seeded by the
content hash) produces stable pseudo-features so the Spark-side
plumbing — schema, batching, partitioning — is real and testable.

Scale notes: media bytes dominate row width, so feature extraction
selects (id, media) only (column pruning keeps metadata scans cheap),
and `spark.sql.files.maxPartitionBytes` should be sized so one task's
Arrow batches fit comfortably in executor memory; `mapInPandas`
streams batches, never materializing a whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
        StructField("source_uri", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha256", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_image(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWxC array.

    STUB: real decoding needs an image codec library not present in
    this environment. With ``fake=True`` a deterministic pseudo-decode
    (content-hash-seeded) stands in so downstream plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library (e.g. Pillow); "
            "run with fake=True for deterministic pseudo-decode"
        )
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(
    media: DataFrame, feature_dim: int = 16, fake_decode: bool = True
) -> DataFrame:
    """Media → fixed-width feature vectors, vectorized end to end.

    Split by where each step belongs:
    - n_bytes / content_sha256 are Column expressions (JVM-side,
      codegen'd — no reason to ship bytes through Python for a hash the
      engine computes natively).
    - decode is the per-item Python boundary (a real codec is
      row-at-a-time by nature; here it's the deterministic stub).
    - featurize is ONE BLAS call per Arrow batch: decoded pixels are
      stacked to a (batch, H·W·C) matrix and projected through a fixed
      seeded random matrix — the shape a real linear probe / embedding
      head would take, not a per-row loop.
    """
    from pyspark.sql import functions as F

    cols = ["media_id", "kind", "content"]
    out_cols = [f.name for f in FEATURE_SCHEMA.fields]

    annotated = media.select(
        *cols,
        F.length(F.coalesce(F.col("content"), F.lit(b""))).cast("bigint").alias("n_bytes"),
        F.sha2(F.coalesce(F.col("content"), F.lit(b"")), 256).alias("content_sha256"),
    )

    # Self-contained worker function: locals + in-function imports only,
    # so cloudpickle ships it by value and Python workers need neither
    # this package on sys.path nor addPyFile staging. (A module-level
    # helper would be pickled by reference and break when the driver
    # process runs outside the repo directory.)
    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        # Fixed projection head: (feature_dim, H·W·C), seeded once per
        # task — identical on every executor, every run.
        proj = _np.random.default_rng(42).standard_normal((feature_dim, 8 * 8 * 3))

        for pdf in batches:
            if len(pdf) == 0:
                yield _pd.DataFrame({c: [] for c in out_cols})
                continue
            # Decode: the one per-item Python step (stubbed codec).
            if not fake_decode:
                raise NotImplementedError(
                    "image decoding requires a codec library (e.g. Pillow); "
                    "run with fake_decode=True for deterministic pseudo-decode"
                )
            decoded = [
                _np.random.default_rng(
                    int.from_bytes(
                        _hashlib.sha256(
                            bytes(c) if c is not None else b""
                        ).digest()[:8],
                        "big",
                    )
                ).integers(0, 256, size=(8, 8, 3), dtype=_np.uint8)
                for c in pdf["content"]
            ]
            # Featurize: one matrix multiply for the whole batch.
            pixels = _np.stack(decoded).reshape(len(decoded), -1).astype(_np.float64)
            feats = ((pixels / 255.0) @ proj.T).astype(_np.float32)
            out = pdf[["media_id", "kind", "n_bytes", "content_sha256"]].copy()
            out["features"] = list(feats)
            yield out[out_cols]

    return annotated.mapInPandas(_featurize, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
        StructField("pixels", ArrayType(FloatType())),  # h·w·3 row-major, [0,1]
    ]
)


def resize_images(
    media: DataFrame,
    width: int = 4,
    height: int = 4,
    fake_decode: bool = True,
    max_source_side: int = 64,
    decoder: str = "rng",
) -> DataFrame:
    """Images → fixed (height, width, 3) pixel grids, normalized [0, 1].

    The decode step (stubbed, like extract_features) materializes each
    image at its METADATA-declared (width, height) — capped at
    ``max_source_side`` so a lying metadata row can't allocate
    unboundedly — then resamples by nearest-index gathering on a numpy
    grid (two fancy-index ops per image, no Python pixel loop); a real
    codec/resampler drops into the same per-item slot.

    Two stub decoders (``decoder``):

    - ``"rng"`` (default): content-hash-seeded RNG pixels — stable per
      payload, but NO locality: payloads differing in one byte decode
      to unrelated grids, so it can only model exact-duplicate media.
    - ``"bytegrid"``: grayscale grid read directly from evenly-spaced
      payload bytes — source pixel k holds payload byte
      ``k·n_bytes // n_src_px`` in all three channels. This preserves
      LOCALITY, the property a real codec has and the RNG stub lacks:
      payloads differing in a few bytes decode to grids differing in a
      few cells, so pixel-space near-dup detection (perceptual_hashes →
      pigeonhole pairs) exercises real 0 < hamming ≤ k paths, and the
      transform is SQL-expressible so a DuckDB oracle can replay it
      bit-exactly. An empty payload decodes to the zero grid.

    Spark-side shape: kind filter + column pruning happen BEFORE the
    Python boundary (only media_id/content/width/height cross Arrow),
    and mapInPandas streams batches — one task never materializes a
    whole partition of image bytes.
    """
    from pyspark.sql import functions as F

    if decoder not in ("rng", "bytegrid"):
        # a typo'd name would otherwise silently select the locality-
        # free RNG decoder and degrade near-dup detection to
        # exact-duplicates-only with no error anywhere downstream
        raise ValueError(
            f"unknown decoder {decoder!r}: expected 'rng' or 'bytegrid'"
        )
    out_cols = [f.name for f in RESIZED_SCHEMA.fields]
    # r17 widening A/B (REJECTED, guide §1): wrapping this in
    # fanout_parallel before the Python boundary was measured isolated
    # both ways at sf0.1 — warm medians 1.2 s widened vs 1.2 s
    # unwidened (the 3.9 s cold reading that motivated the test was
    # codegen + Python-worker startup, paid once per session, not
    # single-task decode). The stub decode of small payloads is far
    # under fanout_parallel's ≥1 s/split bar, and at real media scale
    # the scan has enough splits that the widening self-skips anyway —
    # so the extra payload exchange buys nothing at either end.
    pruned = media.filter(F.col("kind") == "image").select(
        "media_id", "content", "width", "height"
    )

    # Self-contained worker (cloudpickle-by-value; see _featurize note).
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        if not fake_decode:
            raise NotImplementedError(
                "image decoding requires a codec library (e.g. Pillow); "
                "run with fake_decode=True for deterministic pseudo-decode"
            )
        for pdf in batches:
            if len(pdf) == 0:
                yield _pd.DataFrame({c: [] for c in out_cols})
                continue
            out_px = []
            for c, sw, sh in zip(pdf["content"], pdf["width"], pdf["height"]):
                src_w = int(min(sw, max_source_side)) if _pd.notna(sw) and sw else 8
                src_h = int(min(sh, max_source_side)) if _pd.notna(sh) and sh else 8
                src_w, src_h = max(src_w, 1), max(src_h, 1)
                payload = bytes(c) if c is not None else b""
                if decoder == "bytegrid":
                    n_src = src_h * src_w
                    if payload:
                        raw = _np.frombuffer(payload, dtype=_np.uint8)
                        pos = (_np.arange(n_src) * len(raw)) // n_src
                        gray = raw[pos]
                    else:
                        gray = _np.zeros(n_src, dtype=_np.uint8)
                    img = _np.repeat(
                        gray.reshape(src_h, src_w, 1), 3, axis=2
                    )
                else:
                    seed = int.from_bytes(
                        _hashlib.sha256(payload).digest()[:8], "big"
                    )
                    img = _np.random.default_rng(seed).integers(
                        0, 256, size=(src_h, src_w, 3), dtype=_np.uint8
                    )
                rows = (_np.arange(height) * src_h) // height
                cols = (_np.arange(width) * src_w) // width
                resized = img[rows][:, cols].astype(_np.float32) / 255.0
                out_px.append(resized.reshape(-1))
            out = _pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "out_width": _np.int64(width),
                    "out_height": _np.int64(height),
                }
            )
            out["pixels"] = out_px
            yield out[out_cols]

    return pruned.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def ahash_fingerprints(
    resized: DataFrame, id_col: str = "media_id", pixels_col: str = "pixels"
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprints over resized pixel
    grids → (doc, simhash), the input shape dedup.simhash_near_pairs
    expects.

    The classic perceptual hash: gray each cell, set bit k iff cell k
    is brighter than the grid mean. Computed entirely JVM-side with
    higher-order array functions — no Python stage, no shuffle, one
    projection over resize_images' output: per-channel bytes are
    recovered exactly from the normalized floats (v/255 in float32
    round-trips bit-exactly for all 256 byte values, pytest-verified),
    each cell's gray is the exact-integer CHANNEL SUM R+G+B (comparing
    3·mean scales both sides of the brightness test by 3, so the sum
    is equivalent to mean luma with no division), and the mean
    comparison is exact-integer (sum·n_cells > Σ sums). For
    grayscale-equal channels (the bytegrid stub decoder) this is
    bit-identical to a single-channel hash; for true RGB inputs it is
    the perceptually correct brightness, not an R-channel hash.
    Callers must resize every image to the SAME grid — the
    pigeonhole pair join needs uniform fingerprint width — with at
    most 64 cells (one BIGINT; the bit-63 cell sets the sign bit via
    the bitwise-OR fold, which is overflow-free by construction).

    WIDTH IS THE SCALE KNOB (Manku et al., WWW'07): pigeonhole
    blocking over b-bit fingerprints with k-bit Hamming tolerance
    joins on (k+1) blocks of b/(k+1) bits, so two RANDOM fingerprints
    collide on some block with probability (k+1)·2^-(b/(k+1)) — at 32
    bits / 4 blocks that is ~1.6%, which against a 500k-image corpus
    manufactures ~2e9 coincidental candidates (quadratic-in-waiting,
    the same trap as a fixed LSH plane count). The 8×4=32-bit grid is
    the small-corpus/oracle configuration; corpus-scale dedup uses
    8×8=64 bits (collision rate 4·2^-16 ≈ 0.006%), and
    dedup.simhash_near_pairs(bits=64) splits the blocks correctly
    either way. bench_scaling's media_pixel_dedup_adaptive runner
    measures the 64-bit configuration.

    Unlike the byte-gram SimHash (dedup.media_byte_fingerprints),
    this operates in PIXEL space after decode+resize, so with a real
    codec it catches re-encoded/resampled variants whose bytes share
    nothing — the actual multimodal-dedup failure mode. The bytegrid
    stub decoder preserves locality, so the near-dup path (small
    positive Hamming distances) is exercised for real even without a
    codec."""
    from pyspark.sql import functions as F

    # empty/short guard OUTSIDE the transform: sequence(0, -1) is NOT
    # empty (Spark infers step -1 and yields [0, -1]), so a bare
    # transform over it would index into the empty pixels array
    def _chan(off: int) -> str:
        return (
            f"CAST(round(CAST(element_at({pixels_col}, k*3+{off}) AS DOUBLE) "
            f"* 255.0D, 0) AS BIGINT)"
        )

    # each channel rounds back to its exact byte independently, so the
    # sum is the exact integer R+G+B (max 765·64 cells — nowhere near
    # BIGINT range)
    grays = (
        f"CASE WHEN size({pixels_col}) < 3 THEN array() "
        f"ELSE transform(sequence(0, CAST(size({pixels_col}) div 3 AS INT) - 1), "
        f"k -> {_chan(1)} + {_chan(2)} + {_chan(3)}) END"
    )
    # bitwise-OR fold, not +: identical for distinct bits, and the
    # 64-cell grid's bit-63 term (Long.MIN_VALUE) cannot overflow an OR.
    # >64 cells would wrap silently (shiftleft masks the shift mod 64,
    # colliding fingerprints and mass-false-pairing the pigeonhole
    # join) — raise in-plan instead.
    fp = (
        "CASE WHEN size(__gs) > 64 THEN CAST(raise_error("
        "'ahash_fingerprints: grid exceeds 64 cells — fingerprint bits "
        "would wrap; resize to at most 8x8') AS BIGINT) "
        "WHEN size(__gs) = 0 THEN 0L "
        "ELSE aggregate(sequence(0, size(__gs) - 1), 0L, (acc, k) -> "
        "acc | IF(element_at(__gs, k+1) * size(__gs) > __tot, "
        "shiftleft(1L, k), 0L)) END"
    )
    return (
        resized.withColumn("__gs", F.expr(grays))
        .withColumn("__tot", F.expr("aggregate(__gs, 0L, (acc, x) -> acc + x)"))
        .select(F.col(id_col).alias("doc"), F.expr(fp).alias("simhash"))
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp.
    The timestamp fan-out is pure SQL (sequence+explode — no Python);
    only the per-frame decode (stubbed) would run in mapInPandas."""
    from pyspark.sql import functions as F

    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
