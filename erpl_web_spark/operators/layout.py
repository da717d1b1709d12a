"""Data-layout operators: space-filling-curve keys for multi-dimensional
locality.

At 100 TB the scan cost of a query is set less by the engine than by
the LAYOUT of the files it reads: parquet row-group min/max stats prune
only along the sort order, so a table range-partitioned by one column
answers range predicates on that column alone. Interleaving the bits of
several quantized columns (Morton / Z-order — the technique behind
Delta/Iceberg OPTIMIZE ZORDER) gives every dimension partial locality:
``df.repartitionByRange(n, zorder_key)`` followed by a write yields
files whose min/max rectangles are small in EVERY keyed dimension, so
predicates on any of them prune.

Everything here is a pure column expression (shift/and/or on BIGINT) —
JVM-side, codegen-friendly, engine-portable, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_expr(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) key of ``cols``: bit ``i`` of column ``c`` lands
    at key bit ``i * len(cols) + c``, so the key's high bits cut the
    space into nested hyper-rectangles — a prefix of the key addresses
    a box that is small in EVERY dimension (the property range keys
    lack: their prefix is a slab, unbounded in all but one dimension).

    Inputs must be non-negative integers below ``2**bits`` (quantize
    first — modulo, ``ntile``, or fixed-point; the quantizer, not the
    key, owns the value-to-cell mapping). ``len(cols) * bits`` must fit
    a signed 64-bit key (<= 63). The expression is an O(bits x dims)
    tree of shift/and/or — whole-stage-codegen friendly, no UDF.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 63-bit key")
    cs = [(F.col(c) if isinstance(c, str) else c).cast("long") for c in cols]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for c, col in enumerate(cs):
            key = key + F.shiftleft(
                F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + c
            )
    return key


def zorder_bucket_profile(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    bucket_bits: int = 8,
) -> DataFrame:
    """Locality profile of a Z-order layout: bucket rows by the key's
    top ``bucket_bits`` bits (the unit a range-partitioned write would
    turn into files) and report each bucket's row count and per-
    dimension min/max span. The spans ARE the data-skipping guarantee:
    with d dimensions, each top-``bucket_bits`` bucket is a box of side
    2**(bits - ceil(bucket_bits / d)) per dimension, so every file
    prunes against predicates on ANY keyed column — measured here as a
    checkable aggregate rather than asserted. Returns one row per
    non-empty bucket: (bucket, n_rows, <col>_min/_max per column).
    """
    key = zorder_key_expr(list(cols), bits)
    b = F.shiftright(key, len(cols) * bits - bucket_bits).alias("bucket")
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.select(b, *cols).groupBy("bucket").agg(*aggs)
