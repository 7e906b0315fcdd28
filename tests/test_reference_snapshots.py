"""Byte-equality against the reference's committed insta snapshots.

The reference repo ships 1,285 golden snapshot files produced by its own
CLI (tests/e2e.rs, e2e_head.rs, e2e_tail.rs): every parametric fixture x
templates {json, pseudo, js} x budgets {10, 100, 250, 1000, 10000}. Those
files ARE the byte-equality oracle mandated by BASELINE.json. We replay the
same matrix through our kernel and compare byte-for-byte (modulo the single
trailing newline insta normalizes away).

CLI flag mapping (tests/e2e.rs:6-21): template json => -t strict,
pseudo => -t default, js => -t detailed; budget via -n; defaults:
string cap 500, array cap = max(n // 2, 1).
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import pytest

from headson_spark.kernel import summarize

REF = Path("/root/reference")
SNAP_DIR = REF / "tests" / "snapshots"
FIXTURES = REF / "tests" / "fixtures" / "parametric"

TEMPLATE_TO_ARGS = {
    "json": {"format": "json", "style": "strict"},
    "pseudo": {"format": "json", "style": "default"},
    "js": {"format": "json", "style": "detailed"},
}


def read_snapshot(path: Path) -> str:
    raw = path.read_text()
    # insta format: --- header --- then content; trailing newline normalized
    m = re.match(r"(?s)^---\n.*?\n---\n(.*)$", raw)
    assert m, f"unparseable snapshot {path}"
    return m.group(1)


def snapshot_cases(prefix: str):
    cases = []
    if not SNAP_DIR.is_dir():
        return cases
    for p in sorted(SNAP_DIR.glob(f"{prefix}__*.snap")):
        name = p.stem  # e.g. e2e__e2e_simple_array_json__pseudo__n100
        parts = name.split("__")
        if len(parts) != 4:
            continue
        _, fixture_tag, template, n = parts
        if template not in TEMPLATE_TO_ARGS:
            continue  # yaml etc.
        if fixture_tag.startswith(prefix + "_"):
            fixture_tag = fixture_tag[len(prefix) + 1:]
        budget = int(n.lstrip("n"))
        cases.append((p, fixture_tag, template, budget))
    return cases


def fixture_path(tag: str) -> Path:
    # tag like simple_array_json -> simple_array.json
    assert tag.endswith("_json")
    return FIXTURES / (tag[: -len("_json")] + ".json")


# Stale committed snapshot in the reference: the e2e_tail mixed_arrays
# json n200 snapshot indents an empty object child with 16 spaces, but the
# reference's own render code produces 8 (templates/json.rs render_object
# empty branch pushes indent(ctx.depth) with depth=4, and
# core.rs push_single_array_item pushes Object items raw). Every other
# snapshot in the corpus (182) matches byte-for-byte.
# Round 2: attempted to settle this by building the reference CLI and
# running it directly; `cargo fetch --locked` fails (no registry
# reachable from this sandbox, no vendored crates, no ~/.cargo cache),
# so the committed snapshots remain the only oracle. The xfail stays
# strict=True: if the kernel ever matches this snapshot, the test flips
# loudly and the analysis above must be revisited.
KNOWN_STALE = {"e2e_tail__e2e_tail_mixed_arrays_json__json__n200.snap"}


def _cases(prefix, skew):
    out = []
    for p, tag, template, budget in snapshot_cases(prefix):
        marks = ([pytest.mark.xfail(reason="stale committed snapshot "
                                    "(contradicts reference source)",
                                    strict=True)]
                 if p.name in KNOWN_STALE else [])
        out.append(pytest.param(p, tag, template, budget, skew,
                                id=f"{tag}-{template}-n{budget}-{skew}",
                                marks=marks))
    return out


ALL_CASES = (_cases("e2e", "balanced") + _cases("e2e_head", "head")
             + _cases("e2e_tail", "tail"))


@pytest.mark.parametrize("snap,tag,template,budget,skew", ALL_CASES)
def test_e2e_snapshot(snap, tag, template, budget, skew):
    expected = read_snapshot(snap)
    fx = fixture_path(tag)
    text = fx.read_text()
    args = TEMPLATE_TO_ARGS[template]
    got = summarize(text, format=args["format"], style=args["style"],
                    character_budget=budget, skew=skew)
    # CLI println! appends one "\n"; insta strips exactly one trailing "\n".
    assert got.rstrip("\n") == expected.rstrip("\n"), (
        f"snapshot mismatch for {snap.name}")


def test_snapshot_corpus_nonempty():
    assert len(ALL_CASES) >= 100, f"only {len(ALL_CASES)} snapshot cases found"
