"""Pin the reference's text + fileset snapshots
(/root/reference/tests/text_snapshots.rs, fileset_*.rs)."""

from __future__ import annotations

import re
from pathlib import Path

from headson_spark.kernel import summarize, summarize_many

SNAP = Path("/root/reference/tests/snapshots")


def read_snap(name: str) -> str:
    raw = (SNAP / f"{name}.snap").read_text()
    return re.match(r"(?s)^---\n.*?\n---\n(.*)$", raw).group(1)


def norm(s: str) -> str:
    return s.rstrip("\n") + "\n"


def test_text_stdin_snapshot():
    # CLI: -i text -f text, stdin "a\r\nb\r\nc\r\n" (CRLF normalization)
    out = summarize(b"a\r\nb\r\nc\r\n", format="text", input_format="text")
    assert norm(out) == norm(read_snap("text_snapshots__text_stdin_snapshot"))


def test_fileset_text_files_snapshot():
    # CLI: -n 10000 -f auto a.txt b.log (per-file budget => effective 20000)
    out = summarize_many(
        [("a.txt", b"one\ntwo\n"), ("b.log", b"alpha\nbeta\n")],
        format="auto", input_format="text", per_input_budget=10000)
    assert norm(out) == norm(
        read_snap("text_snapshots__fileset_text_files_snapshot"))


def test_pseudo_fileset_headers_and_summary():
    p1 = Path("/root/reference/tests/fixtures/explicit/object_small.json")
    p2 = Path(
        "/root/reference/tests/fixtures/explicit/array_numbers_50.json")
    out = summarize_many(
        [(str(p1), p1.read_text()), (str(p2), p2.read_text())],
        format="json", style="default", per_input_budget=100_000)
    assert "==> " in out
    small = summarize_many(
        [(str(p1), p1.read_text()), (str(p2), p2.read_text())],
        format="json", style="default", per_input_budget=25)
    assert "more files" in small or "…" in small
