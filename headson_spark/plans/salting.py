"""conv_id skew handling: salted pre-aggregation ahead of the
session-window / preview shuffle (north_star skew clause).

A hot conversation (e.g. the `skewhot` fixture's 50k-turn conversation)
lands on one reducer. Because the preview kernel only ever keeps
`array_cap` turns per conversation (budget-derived limit pushdown), we can
pre-reduce each hot conversation's turns on SALT sub-partitions first and
merge the survivors, bounding any single task at cap * n_salts rows.

Two-phase pattern:
  1. salt = hash(turn_idx) % n_salts; per (conv_id, salt): keep only turns
     that could survive the sampler (head cap: smallest `cap` turn_idx;
     tail: largest; default: positions in the precomputed keep-set)
  2. global merge per conv_id (now at most cap * n_salts rows)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def detect_hot_conversations(df: DataFrame,
                             threshold: int = 10_000) -> DataFrame:
    return (df.groupBy("conv_id").agg(F.count("*").alias("n"))
            .filter(F.col("n") > threshold).select("conv_id", "n"))


def salted_head_prereduce(df: DataFrame, cap: int,
                          n_salts: int = 16) -> DataFrame:
    """Phase-1 reduction for head-sampled previews: per salt keep the
    smallest `cap` turn_idx; the global head-cap of the merged result is
    identical because min-k is a semilattice (merge of per-part min-k
    supersets the global min-k)."""
    salted = df.withColumn(
        "_salt", (F.abs(F.hash("turn_idx")) % n_salts))
    w = Window.partitionBy("conv_id", "_salt").orderBy(
        "turn_idx", F.desc("ts"))
    return (salted.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn", "_salt"))


def salted_tail_prereduce(df: DataFrame, cap: int,
                          n_salts: int = 16) -> DataFrame:
    salted = df.withColumn(
        "_salt", (F.abs(F.hash("turn_idx")) % n_salts))
    w = Window.partitionBy("conv_id", "_salt").orderBy(
        F.desc("turn_idx"), F.desc("ts"))
    return (salted.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn", "_salt"))
