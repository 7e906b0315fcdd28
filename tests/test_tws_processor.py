"""PreviewProcessor (TWS engine) semantics, unit-tested against mock
state handles — protobuf blocks transformWithStateInPandas EXECUTION in
this sandbox, but the processor's merge/timer/emit logic is plain Python.
These tests drive it with fake MapState/ValueState/handle objects and
assert byte-equal previews vs engine.py's per-conversation reference
engine (driven with a fake GroupState) on the same turn sequences,
including late-turn LWW, out-of-order delivery, stale-duplicate drops,
and timer expiry. Only the Spark wiring awaits a protobuf-enabled image.
"""

from __future__ import annotations

import pandas as pd
import pytest

from headson_spark.streaming.engine import make_stateful_preview_fn
from headson_spark.streaming.tws_engine import PreviewProcessor


# --------------------------------------------------------------------------
# fakes


class FakeMapState:
    def __init__(self):
        self.d = {}

    def iterator(self):
        return iter(self.d.items())

    def containsKey(self, k):
        return k in self.d

    def getValue(self, k):
        return self.d[k]

    def updateValue(self, k, v):
        self.d[k] = v

    def clear(self):
        self.d.clear()


class FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = v

    def clear(self):
        self.v = None


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = []

    def getMapState(self, name, key_schema, value_schema):
        return self.states.setdefault(name, FakeMapState())

    def getValueState(self, name, schema):
        return self.states.setdefault(name, FakeValueState())

    def registerTimer(self, ts_ms):
        self.timers.append(ts_ms)


class FakeGroupState:
    """Minimal applyInPandasWithState GroupState stand-in for engine.py's
    per-conversation function."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.watermark_ms = 0
        self.timeout_ts = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None
        self.removed = True

    def getCurrentWatermarkMs(self):
        return self.watermark_ms

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


# --------------------------------------------------------------------------
# drivers


GAP_MS = 600_000


def _batch(rows):
    """rows: list of (turn_idx, role, text, tool, ts_iso)."""
    return pd.DataFrame({
        "turn_idx": pd.array([r[0] for r in rows], dtype="int32"),
        "role": [r[1] for r in rows],
        "text": [r[2] for r in rows],
        "tool": [r[3] for r in rows],
        "ts": pd.Series([pd.Timestamp(r[4]) for r in rows],
                        dtype="datetime64[ns]")})


def run_tws(batches, budget=500, expire=True, **proc_kwargs):
    proc = PreviewProcessor(budget=budget, session_gap_ms=GAP_MS,
                            **proc_kwargs)
    handle = FakeHandle()
    proc.init(handle)
    out = []
    for b in batches:
        out.extend(proc.handleInputRows(("conv",), iter([b]), None))
    if expire:
        out.extend(proc.handleExpiredTimer(("conv",), None, None))
    return out, handle


def run_reference(batches, budget=500, expire=True, **fn_kwargs):
    fn = make_stateful_preview_fn(budget=budget, session_gap_ms=GAP_MS,
                                  **fn_kwargs)
    state = FakeGroupState()
    out = []
    for b in batches:
        out.extend(fn(("conv",), iter([b]), state))
    if expire:
        state.hasTimedOut = True
        out.extend(fn(("conv",), iter([]), state))
    return out, state


def _cmp(batches, budget=500):
    """Both engines on the same sequence: every emission must agree on
    (preview, n_turns, last_ts, final)."""
    tws, _ = run_tws(batches, budget)
    ref, _ = run_reference(batches, budget)
    assert len(tws) == len(ref)
    for a, b in zip(tws, ref):
        ra, rb = a.iloc[0], b.iloc[0]
        assert ra["preview"] == rb["preview"]
        assert ra["n_turns"] == rb["n_turns"]
        assert ra["last_ts"] == rb["last_ts"]
        assert bool(ra["final"]) == bool(rb["final"])
    return tws


# --------------------------------------------------------------------------
# tests


def test_simple_growth_and_close():
    out = _cmp([
        _batch([(0, "user", "hello", "", "2026-01-01T00:00:00"),
                (1, "assistant", "hi there", "", "2026-01-01T00:00:01")]),
        _batch([(2, "user", "more text", "", "2026-01-01T00:00:02"),
                (3, "assistant", "done", "", "2026-01-01T00:00:03")]),
    ])
    # 2 intermediate + 1 final emission
    assert [bool(o.iloc[0]["final"]) for o in out] == [False, False, True]
    assert out[-1].iloc[0]["n_turns"] == 4


def test_late_turn_lww_overwrites():
    """A re-delivered turn with a LATER ts replaces the content in both
    engines (last-write-wins)."""
    out = _cmp([
        _batch([(0, "user", "v1 of turn zero", "",
                 "2026-01-01T00:00:00"),
                (1, "assistant", "turn one", "", "2026-01-01T00:00:01")]),
        _batch([(0, "user", "V2-REWRITE of turn zero", "",
                 "2026-01-01T00:05:00")]),
    ])
    assert "V2-REWRITE" in out[-1].iloc[0]["preview"]


def test_stale_duplicate_is_dropped():
    """A re-delivered turn with an EARLIER ts must NOT overwrite."""
    out = _cmp([
        _batch([(0, "user", "CANONICAL", "", "2026-01-01T00:05:00")]),
        _batch([(0, "user", "STALE-REPLAY", "", "2026-01-01T00:00:00"),
                (1, "assistant", "next", "", "2026-01-01T00:05:01")]),
    ])
    final = out[-1].iloc[0]["preview"]
    assert "CANONICAL" in final and "STALE-REPLAY" not in final


def test_out_of_order_backfill():
    """A gap turn arriving after its successors shifts ranks in the
    bounded-state engine; both engines converge to the same preview."""
    out = _cmp([
        _batch([(0, "user", "first", "", "2026-01-01T00:00:00"),
                (2, "user", "third", "", "2026-01-01T00:00:02"),
                (4, "user", "fifth", "", "2026-01-01T00:00:04")]),
        _batch([(1, "assistant", "second (late)", "",
                 "2026-01-01T00:00:01"),
                (3, "assistant", "fourth (late)", "",
                 "2026-01-01T00:00:03")]),
    ])
    assert out[-1].iloc[0]["n_turns"] == 5


def test_long_conversation_bounded_vs_full_state():
    """600 turns at budget 500: the reference engine holds bounded state
    (keep-set + bitmap) while the TWS processor holds the full map —
    previews must still match byte-for-byte."""
    turns = [(i, "user" if i % 2 == 0 else "assistant",
              f"turn {i} says something number {i * 7}", "",
              f"2026-01-01T{i // 3600:02d}:{(i // 60) % 60:02d}:"
              f"{i % 60:02d}")
             for i in range(600)]
    _cmp([_batch(turns[:250]), _batch(turns[250:])])


def test_timer_expiry_clears_tws_state():
    tws, handle = run_tws([_batch([(0, "user", "x", "",
                                    "2026-01-01T00:00:00")])])
    assert tws[-1].iloc[0]["final"]
    assert not handle.states["turns"].d, "MapState must be cleared"
    assert handle.states["meta"].v is None, "ValueState must be cleared"
    assert handle.timers, "a session timer must have been registered"
    # timer deadline = max event time + gap
    assert handle.timers[-1] == (
        int(pd.Timestamp("2026-01-01T00:00:00").value // 1_000_000)
        + GAP_MS)


def test_reference_engine_removes_state_on_close():
    _, state = run_reference([_batch([(0, "user", "x", "",
                                       "2026-01-01T00:00:00")])])
    assert state.removed


def test_tws_emit_policies_agree_on_final_state():
    """on_change / on_close / every_k: identical final render, the
    documented intermediate-emission counts (3 changed rounds; every_k
    with k=2 emits on round 2 only)."""
    batches = [
        _batch([(0, "user", "a", "", "2026-01-01T00:00:00")]),
        _batch([(1, "assistant", "b", "", "2026-01-01T00:00:01")]),
        _batch([(2, "user", "c", "", "2026-01-01T00:00:02")]),
    ]
    finals = {}
    for policy, expect_inter in (("on_change", 3), ("on_close", 0),
                                 ("every_k", 1)):
        out, _ = run_tws(batches, emit_policy=policy, emit_every=2)
        inter = [o for o in out if not o.iloc[0]["final"]]
        assert len(inter) == expect_inter, (policy, len(inter))
        finals[policy] = out[-1].iloc[0]["preview"]
        assert out[-1].iloc[0]["final"]
    assert len(set(finals.values())) == 1


def test_tws_rejects_unknown_policy():
    with pytest.raises(ValueError):
        PreviewProcessor(emit_policy="sometimes")


def test_emission_count_parity_on_unchanged_batch():
    """A batch that changes nothing (pure stale replay) must not emit in
    either engine."""
    b1 = _batch([(0, "user", "x", "", "2026-01-01T00:05:00")])
    replay = _batch([(0, "user", "ignored", "", "2026-01-01T00:00:00")])
    tws, _ = run_tws([b1, replay], expire=False)
    ref, _ = run_reference([b1, replay], expire=False)
    assert len(tws) == 1 and len(ref) == 1


def test_every_k_cadence_skips_unchanged_rounds_tws_vs_reference():
    """every_k counts CHANGED merge rounds only, identically in the TWS
    processor and the applyInPandasWithState engine: a stale-replay
    round (LWW loser) must not advance the cadence. Changed rounds here
    are 1,2,3,4 with a stale round between 2 and 3; emit_every=2 =>
    intermediates on changed rounds 2 and 4 exactly."""
    batches = [
        _batch([(0, "user", "a", "", "2026-01-01T00:05:00")]),        # r1
        _batch([(1, "assistant", "b", "", "2026-01-01T00:05:01")]),   # r2
        _batch([(0, "user", "stale", "", "2026-01-01T00:00:00")]),    # --
        _batch([(2, "user", "c", "", "2026-01-01T00:05:02")]),        # r3
        _batch([(3, "assistant", "d", "", "2026-01-01T00:05:03")]),   # r4
    ]
    tws, _ = run_tws(batches, emit_policy="every_k", emit_every=2,
                     expire=False)
    ref, _ = run_reference(batches, emit_policy="every_k", emit_every=2,
                           expire=False)
    assert len(tws) == len(ref) == 2
    for a, b in zip(tws, ref):
        ra, rb = a.iloc[0], b.iloc[0]
        assert (ra["preview"], ra["n_turns"]) == \
            (rb["preview"], rb["n_turns"])
    assert [o.iloc[0]["n_turns"] for o in tws] == [2, 4]


def test_timer_reregistered_per_round_and_monotone_under_late_turns():
    """The session-close timer is re-registered on EVERY data round at
    max_event_ts + gap; a late (older-ts) turn must re-register the SAME
    deadline, never move it backward."""
    proc = PreviewProcessor(budget=500, session_gap_ms=GAP_MS)
    handle = FakeHandle()
    proc.init(handle)
    t_new = pd.Timestamp("2026-01-01T00:10:00")
    deadline = t_new.value // 1_000_000 + GAP_MS
    list(proc.handleInputRows(("conv",), iter([_batch(
        [(0, "user", "x", "", "2026-01-01T00:10:00")])]), None))
    assert handle.timers == [deadline]
    # late turn, 9 minutes older: deadline unchanged, re-registered
    list(proc.handleInputRows(("conv",), iter([_batch(
        [(1, "user", "late", "", "2026-01-01T00:01:00")])]), None))
    assert handle.timers == [deadline, deadline]
    # newer turn: deadline advances
    list(proc.handleInputRows(("conv",), iter([_batch(
        [(2, "user", "y", "", "2026-01-01T00:12:00")])]), None))
    assert handle.timers[-1] == deadline + 120_000


def test_expired_timer_then_new_delivery_restarts_conversation():
    """After timer expiry clears TWS state, a later delivery for the
    same key must rebuild the conversation from scratch (fresh rounds
    counter, fresh turn map) and register a fresh timer."""
    proc = PreviewProcessor(budget=500, session_gap_ms=GAP_MS)
    handle = FakeHandle()
    proc.init(handle)
    list(proc.handleInputRows(("conv",), iter([_batch(
        [(0, "user", "first session", "", "2026-01-01T00:00:00")])]),
        None))
    final = list(proc.handleExpiredTimer(("conv",), None, None))
    assert len(final) == 1 and bool(final[0].iloc[0]["final"])
    n_timers = len(handle.timers)
    # same key delivers again: a NEW session
    out = list(proc.handleInputRows(("conv",), iter([_batch(
        [(0, "user", "second session", "", "2026-01-02T00:00:00")])]),
        None))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["n_turns"] == 1 and "second session" in row["preview"]
    assert row["last_ts"] == pd.Timestamp("2026-01-02T00:00:00", tz="UTC")
    assert len(handle.timers) == n_timers + 1
