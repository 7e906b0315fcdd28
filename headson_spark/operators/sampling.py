"""Sampler pushdown — the Spark analogue of the reference's
"limit pushdown into the parse" (samplers applied during deserialization,
SURVEY.md §4). Because all three samplers keep a set of ORIGINAL indices
that is a deterministic function of the cap alone (head: prefix; tail:
suffix; default: fixed 3-phase prefix-closed sequence), the keep-decision
can be evaluated as a vectorized column filter BEFORE the conv_id shuffle,
cutting shuffle volume to O(cap) turns per conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..kernel.arena import default_sample_indices


def default_kept_positions(cap: int, max_len: int = 1 << 20) -> list[int]:
    """The default sampler's kept-position sequence K(cap): for any stream
    of length L the kept set is {i in K(cap) : i < L} (prefix-closed), so
    one precomputed list serves every conversation."""
    return default_sample_indices(cap, max_len)


def with_turn_ordinal(df: DataFrame) -> DataFrame:
    """Dense 0-based position per conversation in stable turn order
    (dedupes (conv_id, turn_idx) last-write-wins by ts first)."""
    w_dedup = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc("ts"))
    w_ord = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (df.withColumn("_rn", F.row_number().over(w_dedup))
              .filter(F.col("_rn") == 1).drop("_rn")
              .withColumn("turn_ord",
                          (F.row_number().over(w_ord) - 1).cast("int")))


def head_cap(df: DataFrame, cap: int) -> DataFrame:
    """Head sampler as a window filter (samplers/head.rs:33-79)."""
    return with_turn_ordinal(df).filter(F.col("turn_ord") < cap)


def tail_cap(df: DataFrame, cap: int) -> DataFrame:
    """Tail sampler (samplers/tail.rs:5-80): last `cap` turns."""
    w = Window.partitionBy("conv_id").orderBy(F.desc("turn_idx"))
    base = with_turn_ordinal(df)
    return (base.withColumn("_rev", F.row_number().over(w))
                .filter(F.col("_rev") <= cap).drop("_rev"))


def default_cap(df: DataFrame, cap: int,
                max_len: int = 100_000) -> DataFrame:
    """Default 3-phase sampler as a broadcast IN-set filter — bit-exact
    with the kernel's mix64 acceptance (samplers/default.rs:131-217)."""
    kept = default_kept_positions(cap, max_len)
    return (with_turn_ordinal(df)
            .filter(F.col("turn_ord").isin(kept)))
