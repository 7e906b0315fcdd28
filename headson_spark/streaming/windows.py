"""Declarative windowed rolling previews (tumbling / sliding variants).

Where the session-window previews live inside applyInPandasWithState
(engine.py), the rolling variants are pure declarative streaming
aggregations: watermark -> window() groupBy -> collect turns -> one
Arrow-vectorized render UDF over the aggregated struct array. Works in
append mode (window closes at watermark), so any sink supports it.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..kernel.api import make_configs
from ..kernel import arena as ar
from ..kernel.order import build_order
from ..kernel.render import find_largest_render_under_budget


def make_render_udf(budget: int = 500, style: str = "default",
                    skew: str = "balanced", fmt: str = "json"):
    cfg, prio, budget_ = make_configs(format=fmt, style=style,
                                      character_budget=budget, skew=skew)

    @pandas_udf("string")
    def render_turns(turns: pd.Series) -> pd.Series:
        out = []
        for arr in turns:
            items = sorted(arr, key=lambda r: (r["turn_idx"], r["ts"]))
            # last-write-wins per turn_idx
            merged: dict[int, tuple] = {}
            for r in items:
                merged[r["turn_idx"]] = (r["role"], r["text"], r["tool"])
            idxs = sorted(merged)
            a = ar.build_conversation_arena(
                [merged[i][0] for i in idxs],
                [merged[i][1] for i in idxs],
                [merged[i][2] for i in idxs],
                prio["array_max_items"], prio["sampler"])
            po = build_order(a, prio["max_string_graphemes"],
                             prefer_tail_arrays=prio["prefer_tail_arrays"],
                             max_pops=max(budget_, 1))
            out.append(find_largest_render_under_budget(po, cfg, budget_))
        return pd.Series(out)

    return render_turns


def rolling_previews(stream_df, *, window: str = "5 minutes",
                     slide: str | None = None,
                     watermark: str = "10 minutes", budget: int = 500,
                     style: str = "default"):
    """Tumbling (slide=None) or sliding rolling previews per conversation
    per event-time window."""
    win = (F.window("ts", window, slide) if slide
           else F.window("ts", window))
    render = make_render_udf(budget=budget, style=style)
    return (stream_df
            .withWatermark("ts", watermark)
            .groupBy(F.col("conv_id"), win.alias("win"))
            .agg(F.collect_list(
                F.struct("turn_idx", "role", "text", "tool", "ts"))
                .alias("turns"))
            .select("conv_id",
                    F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    F.size("turns").alias("n_turns"),
                    render(F.col("turns")).alias("preview")))
