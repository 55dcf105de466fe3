"""Z-order (Morton) multi-column clustering for write-time layout (S8+).

The reference's `cluster_by` hints map linearized sort keys onto
Snowflake micro-partitions; a plain lexicographic sort serves the FIRST
key well but leaves later keys unclustered — a filter on the second key
still touches every file. Interleaving the keys' bits onto one Morton
curve gives every key locality, so parquet row-group / file min-max
pruning works on ALL clustered columns (the same trick Delta's OPTIMIZE
ZORDER BY applies).

Everything is Column arithmetic (shift/and/or on bigint) — codegen'd,
no UDF, one stats pass + one range shuffle:

1. normalize each key to an unsigned `bits`-wide integer — numerics are
   min/max scaled (one tiny agg job), strings take `xxhash64 & mask`
   (hash order is meaningless for ranges, but equal values co-locate);
2. interleave the bit planes into a single long;
3. `repartitionByRange` + `sortWithinPartitions` on the z-key so each
   output file owns a contiguous curve segment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZKEY = "__zorder"


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton-interleave the low `bits` of non-negative long columns:
    output bit (b·n + i) = bit b of cols[i]. Requires bits·len(cols) ≤ 63."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols exceeds a signed long")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> DataFrame:
    """df + a ``__zorder`` column over `cols`.

    Numeric/timestamp columns are min/max scaled into [0, 2^bits) with
    one aggregate job over just those columns (column-pruned stats
    scan); string columns are hashed. Nulls sort first (bucket 0).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs >= 2 columns (use a plain sort for 1)")
    bits = bits or (63 // n)
    mask = (1 << bits) - 1

    numeric = [
        c
        for c in cols
        if df.schema[c].dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "date", "timestamp", "timestamp_ntz")
        or df.schema[c].dataType.typeName().startswith("decimal")
    ]
    stats = {}
    if numeric:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in numeric],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in numeric],
        ).head()
        stats = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in numeric}

    buckets: list[Column] = []
    for c in cols:
        if c in stats and stats[c][0] is not None and stats[c][1] > stats[c][0]:
            mn, mx = stats[c]
            scaled = F.floor(
                (F.col(c).cast("double") - F.lit(mn))
                / F.lit(mx - mn)
                * F.lit(float(mask))
            ).cast("bigint")
            buckets.append(F.coalesce(scaled, F.lit(0)))
        elif c in stats:
            buckets.append(F.lit(0).cast("bigint"))  # constant / all-null column
        else:
            buckets.append(
                F.coalesce(
                    F.pmod(F.xxhash64(F.col(c)), F.lit(mask + 1)), F.lit(0)
                ).cast("bigint")
            )
    return df.withColumn(ZKEY, interleave_bits(buckets, bits))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort on the Morton key, key dropped: ready to
    write. Each output file covers a contiguous curve segment, so file
    min/max stats stay tight on every clustered column. Leave
    ``num_partitions`` unset to let AQE size the range partitions; pin
    it when a fixed file count matters."""
    keyed = with_zorder_key(df, cols, bits)
    if num_partitions:
        ranged = keyed.repartitionByRange(num_partitions, F.col(ZKEY))
    else:
        ranged = keyed.repartitionByRange(F.col(ZKEY))
    return ranged.sortWithinPartitions(ZKEY).drop(ZKEY)
