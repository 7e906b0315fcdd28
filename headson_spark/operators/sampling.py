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


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      id_col: str = "doc_id", strat_col: str = "lang",
                      default_frac: float = 0.0) -> DataFrame:
    """Deterministic per-stratum downsampling — the standard
    training-data mixture-rebalancing step (e.g. cap English at 10%,
    keep low-resource languages at 100%).

    Keep decision: u(id) < fraction(stratum), with u(id) a uniform
    [0,1) value derived from md5(id) (first 15 hex nibbles = 60 bits).
    Fully deterministic and engine-independent (the same arithmetic runs
    in the DuckDB oracle), unlike DataFrame.sampleBy which is seeded RNG
    per partition. Pure column expressions, zero shuffle: at 100 TB this
    is a scan-side filter.
    """
    u = (f"cast(conv(substring(md5(cast({id_col} as string)), 1, 15), "
         f"16, 10) as bigint) / 1152921504606846976.0")  # / 2^60
    frac = "CASE"
    for k in sorted(fractions):
        frac += f" WHEN {strat_col} = '{k}' THEN cast({fractions[k]!r} as double)"
    frac += f" ELSE cast({default_frac!r} as double) END"
    return (df.withColumn("_u", F.expr(u))
              .filter(F.expr(f"_u < {frac}"))
              .drop("_u"))
