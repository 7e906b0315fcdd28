"""YAML round-trip property over the reference's vendored yaml-test-suite
corpus (mirrors /root/reference/tests/yaml_suite.rs:36-80): ingest YAML,
render YAML untruncated, re-parse, compare semantically."""

from __future__ import annotations

import glob
import json

import pytest

from headson_spark.kernel import summarize
from headson_spark.kernel.arena import BOOL, NULL, NUMBER
from headson_spark.kernel.yaml_ingest import (_ALIAS_TAG, _canon_key,
                                              _resolve_plain,
                                              compose_documents)
from yaml.nodes import MappingNode, ScalarNode, SequenceNode

CORPUS = sorted(glob.glob(
    "/root/reference/tests/fixtures/yaml/yaml-test-suite/*.yaml"))

# Round-1 flagged 5 fixtures as "re-flow divergences"; the real cause was
# the default string cap (500 graphemes) truncating their long embedded
# scalars — the reference's own harness passes --string-cap 1000000
# (tests/yaml_suite.rs:14-15). With the cap matched, all 351 round-trip.


def _norm(node):
    if node is None:
        return None
    if isinstance(node, SequenceNode):
        return [_norm(c) for c in node.value]
    if isinstance(node, MappingNode):
        return {json.dumps(_canon_key(k)): _norm(v) for k, v in node.value}
    if isinstance(node, ScalarNode):
        if node.tag == _ALIAS_TAG:
            return "*alias"
        if node.style is None:
            kind, token = _resolve_plain(node.value)
            if kind == NUMBER:
                try:
                    return float(token)
                except ValueError:
                    return token
            if kind == BOOL:
                return token == "true"
            if kind == NULL:
                return None
            return node.value
        return node.value
    return None


def _wrap(docs):
    if len(docs) == 0:
        return []
    if len(docs) == 1:
        return _norm(docs[0])
    return [_norm(d) for d in docs]


@pytest.mark.parametrize(
    "path", CORPUS, ids=[p.rsplit("/", 1)[-1] for p in CORPUS])
def test_yaml_roundtrip_semantic(path):
    data = open(path, "rb").read()
    out = summarize(data, format="yaml", input_format="yaml",
                    character_budget=10**6, string_cap=10**6)
    assert _wrap(compose_documents(data.decode("utf-8"))) == \
        _wrap(compose_documents(out))


def test_corpus_present():
    assert len(CORPUS) >= 300
