"""transformWithStateInPandas streaming engine (Spark 4 TWS API).

Alternative to engine.py's applyInPandasWithState path: per-turn MapState
means each micro-batch writes only the turns it changed (delta writes)
instead of re-serializing the whole conversation blob, and timers give
native session closure. Requires the RocksDB state store provider.

Semantics are identical to engine.py (last-write-wins merge on
(conv_id, turn_idx), stable order, budgeted render, update-mode
emissions).

ENVIRONMENT NOTE: TWS's Python control channel requires `protobuf`
(pyspark.sql.streaming.proto), which is not installed in this sandbox
(and installs are disallowed), so this engine cannot execute here —
tests/test_tws_engine.py gates on the import. On a standard cluster
image (protobuf ships with pyspark[connect]) this is the preferred
stateful path: per-turn MapState writes are O(changed turns) per batch
instead of O(conversation), which removes the state-churn term that
caps engine.py at ~15k turns/s.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from ..kernel.api import make_configs
from .engine import OUTPUT_SCHEMA, _render_from_turn_map

TURN_KEY_SCHEMA = "turn_idx int"
TURN_VALUE_SCHEMA = "role string, text string, tool string, ts_us long"
META_SCHEMA = "max_ts_us long, rounds int"


class PreviewProcessor:
    """StatefulProcessor holding per-conversation turns in MapState.

    emit_policy mirrors engine.py: "on_change" (default) emits every
    changed round, "on_close" emits only the final render at timer
    expiry, "every_k" emits a changed conversation on its every
    emit_every-th CHANGED merge round (all three engines count only
    changed rounds). Final emissions are policy-independent.

    CHECKPOINT COMPATIBILITY: META_SCHEMA widened in round 3 from
    'max_ts_us long' to 'max_ts_us long, rounds int'. Spark validates
    the state value schema BEFORE the processor reads a row, so
    pre-change TWS checkpoints fail on resume regardless of any
    defensive read here — resume them with a NEW checkpoint dir (or
    rely on TWS state-schema evolution where the deployment Spark
    version supports it).
    """

    def __init__(self, budget: int = 500, style: str = "default",
                 skew: str = "balanced", fmt: str = "json",
                 session_gap_ms: int = 600_000,
                 emit_policy: str = "on_change", emit_every: int = 8):
        if emit_policy not in ("on_change", "on_close", "every_k"):
            raise ValueError(f"unknown emit_policy: {emit_policy!r}")
        self.budget = budget
        self.style = style
        self.skew = skew
        self.fmt = fmt
        self.session_gap_ms = session_gap_ms
        self.emit_policy = emit_policy
        self.emit_every = emit_every

    # --- StatefulProcessor interface ---

    def init(self, handle):
        self.handle = handle
        self.turns = handle.getMapState("turns", TURN_KEY_SCHEMA,
                                        TURN_VALUE_SCHEMA)
        self.meta = handle.getValueState("meta", META_SCHEMA)
        cfg, prio, budget = make_configs(
            format=self.fmt, style=self.style,
            character_budget=self.budget, skew=self.skew)
        self._cfg, self._prio, self._budget = cfg, prio, budget

    def _emit(self, conv_id: str, final: bool):
        turn_map = {}
        for k, v in self.turns.iterator():
            turn_map[str(k[0])] = [v[0], v[1], v[2], v[3]]
        if not turn_map:
            return None
        preview = _render_from_turn_map(turn_map, self._cfg, self._prio,
                                        self._budget)
        max_ts = max(v[3] for v in turn_map.values())
        return pd.DataFrame({
            "conv_id": [conv_id], "preview": [preview],
            "n_turns": [len(turn_map)],
            "last_ts": [pd.Timestamp(max_ts, unit="us", tz="UTC")],
            "final": [final]})

    def handleInputRows(self, key, rows, timerValues
                        ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        changed = False
        if self.meta.exists():
            meta = self.meta.get()
            max_ts_us = meta[0]
            rounds = meta[1] if len(meta) > 1 else 0
        else:
            max_ts_us, rounds = 0, 0
        for pdf in rows:
            ts_us_arr = (pdf["ts"].to_numpy("datetime64[ns]")
                         .astype("int64") // 1_000)
            for t_idx, role, text, tool, ts_us in zip(
                    pdf["turn_idx"].tolist(), pdf["role"].tolist(),
                    pdf["text"].tolist(), pdf["tool"].tolist(),
                    ts_us_arr.tolist()):
                k = (int(t_idx),)
                prev = (self.turns.getValue(k)
                        if self.turns.containsKey(k) else None)
                if prev is None or ts_us >= prev[3]:
                    # delta write: only this turn's row hits the store
                    self.turns.updateValue(k, (role, text, tool,
                                               int(ts_us)))
                    changed = True
                if ts_us > max_ts_us:
                    max_ts_us = ts_us
        if changed:
            rounds += 1
        self.meta.update((int(max_ts_us), int(rounds)))
        # session closure timer at max event time + gap
        self.handle.registerTimer(max_ts_us // 1000 + self.session_gap_ms)
        if changed and self._should_emit(rounds):
            out = self._emit(conv_id, final=False)
            if out is not None:
                yield out

    def _should_emit(self, rounds: int) -> bool:
        if self.emit_policy == "on_change":
            return True
        if self.emit_policy == "on_close":
            return False
        return rounds % max(self.emit_every, 1) == 0

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo
                           ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        out = self._emit(conv_id, final=True)
        self.turns.clear()
        self.meta.clear()
        if out is not None:
            yield out

    def handleInitialState(self, key, initialState, timerValues):
        pass

    def close(self):
        pass


def streaming_previews_tws(stream_df, *, budget: int = 500,
                           style: str = "default", skew: str = "balanced",
                           fmt: str = "json",
                           watermark: str = "10 minutes",
                           session_gap_ms: int = 600_000,
                           emit_policy: str = "on_change",
                           emit_every: int = 8):
    proc = PreviewProcessor(budget, style, skew, fmt, session_gap_ms,
                            emit_policy=emit_policy,
                            emit_every=emit_every)
    return (stream_df
            .withWatermark("ts", watermark)
            .groupBy("conv_id")
            .transformWithStateInPandas(
                statefulProcessor=proc,
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="EventTime"))


def run_stream_tws(spark, source_dir: str, sink, checkpoint_dir: str, *,
                   budget: int = 500, style: str = "default",
                   skew: str = "balanced", watermark: str = "10 minutes",
                   session_gap_ms: int = 600_000,
                   available_now: bool = True,
                   max_files_per_trigger: int | None = None):
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)
    out = streaming_previews_tws(src, budget=budget, style=style,
                                 skew=skew, watermark=watermark,
                                 session_gap_ms=session_gap_ms)
    writer = (out.writeStream.foreachBatch(sink).outputMode("update")
              .option("checkpointLocation", checkpoint_dir))
    return (writer.trigger(availableNow=True).start() if available_now
            else writer.start())
