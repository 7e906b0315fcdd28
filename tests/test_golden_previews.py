"""Byte-equality against the committed golden preview matrix
(FIXTURES.md §3): budgets × styles × skews over the fixture conversations.
Regenerate with scripts/gen_golden_previews.py ONLY when a semantic
change is intended — any diff is a kernel behavior change."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from scripts.gen_golden_previews import conversations, BUDGETS, STYLES, SKEWS
from headson_spark.kernel import summarize_value

GOLDEN = json.loads(
    (Path(__file__).parent / "fixtures" / "golden_previews.json")
    .read_text())


def all_cases():
    for conv_id, doc in conversations():
        for style in STYLES:
            for skew in SKEWS:
                for budget in BUDGETS:
                    yield conv_id, doc, style, skew, budget


CASES = list(all_cases())


@pytest.mark.parametrize(
    "conv_id,doc,style,skew,budget", CASES,
    ids=[f"{c}-{s}-{k}-n{b}" for c, _, s, k, b in CASES])
def test_golden_preview(conv_id, doc, style, skew, budget):
    key = f"{conv_id}__{style}__{skew}__n{budget}"
    got = summarize_value(doc, format="json", style=style,
                          character_budget=budget, skew=skew)
    assert got == GOLDEN[key], key


def test_matrix_complete():
    assert len(GOLDEN) == len(CASES) == 432
