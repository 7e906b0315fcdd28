"""Serialization templates + top-k marking + budget binary search.

Re-expression of the reference's render path:
- render set marking:  /root/reference/src/utils/graph.rs:41-61
- recursive serialize: /root/reference/src/serialization/mod.rs:92-299,531-592
- templates:           /root/reference/src/serialization/templates/{json,pseudo,js,text}.rs
- fileset sections:    /root/reference/src/serialization/fileset.rs:21-106
- budget search:       /root/reference/src/lib.rs:117-179, utils/search.rs:2-18

Budgets are measured in BYTES of the rendered UTF-8 string (Rust
`String::len`), not characters.
"""

from __future__ import annotations

import json
from bisect import bisect_left
from dataclasses import dataclass

from .order import (PriorityOrder, K_ARRAY, K_OBJECT, K_STRING, K_ATOMIC,
                    K_PART)

OMISSION = "…"

TEMPLATES = ("json", "pseudo", "js", "yaml", "text", "auto")
STYLES = ("strict", "default", "detailed")

_STYLE_TO_JSON_TEMPLATE = {
    "strict": "json", "default": "pseudo", "detailed": "js"}


@dataclass(frozen=True)
class RenderConfig:
    template: str = "pseudo"
    style: str = "default"
    indent_unit: str = "  "
    space: str = " "
    newline: str = "\n"
    prefer_tail_arrays: bool = False


import re as _re

_NEEDS_ESCAPE = _re.compile(r'["\\\x00-\x1f]')
_KEY_CACHE: dict[str, str] = {}


def json_string(s: str) -> str:
    """JSON string literal, serde_json-compatible (utils/json.rs:4-11)."""
    if _NEEDS_ESCAPE.search(s) is None:
        return f'"{s}"'
    return json.dumps(s, ensure_ascii=False)


def json_key(s: str) -> str:
    v = _KEY_CACHE.get(s)
    if v is None:
        if len(_KEY_CACHE) > 10_000:
            _KEY_CACHE.clear()
        v = _KEY_CACHE[s] = json_string(s)
    return v


class RenderSet:
    """Per-conversation inclusion index shared across binary-search probes.

    Equivalent to the reference's top-k + ancestor-closure marking
    (graph.rs:41-61) but computed ONCE: a node is in the render set for
    any k iff eff_rank[node] < k. Because children enter the heap only
    after their parent pops (build_order's lazy pushes), every node's
    ancestors pop strictly earlier, so the subtree-min pop rank IS the
    node's own pop rank and the ancestor closure is automatic — the
    explicit descending subtree-min fold this class originally carried
    was a no-op (property-tested in test_kernel_props:
    ancestors-pop-first invariant + old-fold equivalence). Per-string
    kept-part counts come from a bisect over the string's ascending
    part-rank list, collected in pop order (already ascending).
    """

    __slots__ = ("eff_rank", "part_ranks", "_po", "_synced")

    _INF = 1 << 60

    def __init__(self, po: PriorityOrder):
        self._po = po
        self._synced = 0
        self.eff_rank: list[int] = []
        self.part_ranks: dict[int, list[int]] = {}
        self.sync()

    def sync(self):
        """Fold pops appended since the last sync (lazy pumping extends
        by_priority between probes; rank order is append-only)."""
        po = self._po
        bp = po.by_priority
        start = self._synced
        n_pops = len(bp)
        if n_pops == start and len(self.eff_rank) >= po.total_nodes:
            return
        rank = self.eff_rank
        if len(rank) < po.total_nodes:
            rank.extend([self._INF] * (po.total_nodes - len(rank)))
        kind = po.kind
        parent = po.parent
        part_ranks = self.part_ranks
        for i in range(start, n_pops):
            pq_id = bp[i]
            rank[pq_id] = i
            if kind[pq_id] == K_PART:
                p = parent[pq_id]
                lst = part_ranks.get(p)
                if lst is None:
                    part_ranks[p] = [i]
                else:
                    lst.append(i)  # pop order => ascending ranks
        self._synced = n_pops

    def kept_parts_for(self, string_id: int, k: int) -> int:
        lst = self.part_ranks.get(string_id)
        if not lst:
            return 0
        return bisect_left(lst, k)


class _Renderer:
    def __init__(self, po: PriorityOrder, cfg: RenderConfig,
                 rset: RenderSet, k: int,
                 escaped_cache: dict[int, str] | None = None):
        self.po = po
        self.cfg = cfg
        self.rset = rset
        self.eff_rank = rset.eff_rank
        self.k = k
        # escaped full-string literals are probe-invariant: cache per node
        self.escaped = escaped_cache if escaped_cache is not None else {}

    # ---- string / atomic leaves ----

    def _string_omitted(self, pq_id: int, kept: int) -> int:
        po = self.po
        orig = po.string_len[pq_id]
        if orig is not None:
            if orig > kept:
                return orig - kept
            if po.string_truncated[pq_id]:
                return 1
            return 0
        return 1 if po.string_truncated[pq_id] else 0

    def _take_graphemes(self, pq_id: int, n: int) -> str:
        s = self.po.value[pq_id] or ""
        brks = self.po.breaks[pq_id]
        if brks is None:
            return s[: max(n, 0)]  # ASCII fast path: 1 char == 1 grapheme
        if n >= len(brks) - 1:
            return s
        return s[: brks[max(n, 0)]]

    def serialize_string(self, pq_id: int, template: str) -> str:
        kept = self.rset.kept_parts_for(pq_id, self.k)
        omitted = self._string_omitted(pq_id, kept)
        full = self.po.value[pq_id] or ""
        if template == "text":
            if omitted == 0:
                return full
            return self._take_graphemes(pq_id, kept) + OMISSION
        if omitted == 0:
            esc = self.escaped.get(pq_id)
            if esc is None:
                esc = self.escaped[pq_id] = json_string(full)
            return esc
        return json_string(self._take_graphemes(pq_id, kept) + OMISSION)

    # ---- structural helpers ----

    def _included_children(self, pq_id: int) -> list[int]:
        kids = self.po.children[pq_id]
        if not kids:
            return []
        eff = self.eff_rank
        k = self.k
        return [c for c in kids if eff[c] < k]

    def _omitted_for(self, pq_id: int, kept: int) -> int:
        total = self.po.total_len[pq_id]
        if total is not None and total > kept:
            return total - kept
        return 0

    # ---- array rendering ----

    def render_array(self, pq_id: int, depth: int, inline: bool,
                     template: str) -> str:
        cfg = self.cfg
        inc = self._included_children(pq_id)
        kept = len(inc)
        omitted = self._omitted_for(pq_id, kept)
        children = []
        for c in inc:
            rendered = self.render_node(c, depth + 1, False, template)
            oi = self.po.orig_index[c]
            children.append((oi if oi is not None else 0,
                             self.po.kind[c], rendered))
        if template == "text":
            return self._render_array_text(children, omitted)
        if template == "yaml":
            if self.cfg.newline == "" and self.cfg.indent_unit == "":
                return self._render_array_marked(
                    children, kept, omitted, depth, inline, None, None)
            return self._render_array_yaml(children, kept, omitted, depth,
                                           inline)
        if template in ("pseudo", "auto"):
            return self._render_array_marked(
                children, kept, omitted, depth, inline,
                gap_marker=lambda gap: OMISSION,
                omit_marker=lambda n: OMISSION)
        if template == "js":
            return self._render_array_marked(
                children, kept, omitted, depth, inline,
                gap_marker=lambda gap: f"/* {gap} more items */",
                omit_marker=lambda n: f"/* {n} more items */")
        # strict json: no markers
        return self._render_array_marked(
            children, kept, omitted, depth, inline, None, None)

    def _render_array_text(self, children, omitted: int) -> str:
        cfg = self.cfg
        out = []

        def omission_line():
            if cfg.style == "strict":
                return
            if cfg.style == "default":
                out.append(OMISSION)
                out.append(cfg.newline)
            else:
                out.append(f"{OMISSION} {omitted} more lines {OMISSION}")
                out.append(cfg.newline)

        if cfg.prefer_tail_arrays and omitted > 0:
            omission_line()
        for _, _, item in children:
            out.append(item)
            out.append(cfg.newline)
        if not cfg.prefer_tail_arrays and omitted > 0:
            omission_line()
        return "".join(out)

    def _render_array_marked(self, children, kept, omitted, depth, inline,
                             gap_marker, omit_marker) -> str:
        cfg = self.cfg
        ind = cfg.indent_unit
        nl = cfg.newline
        out = []
        if kept == 0:
            if not inline:
                out.append(ind * depth)
            if omit_marker is not None and omitted > 0:
                out.append("[ " + omit_marker(omitted) + " ]")
            else:
                out.append("[]")
            return "".join(out)
        if not inline:
            out.append(ind * depth)
        out.append("[")
        out.append(nl)

        def push_omitted():
            if omit_marker is not None and omitted > 0:
                out.append(ind * (depth + 1))
                out.append(omit_marker(omitted))
                if kept > 0 and cfg.prefer_tail_arrays:
                    out.append(",")
                out.append(nl)

        if cfg.prefer_tail_arrays:
            push_omitted()
        prev_index = None
        for i, (orig_index, ckind, item) in enumerate(children):
            if (gap_marker is not None and prev_index is not None
                    and orig_index > prev_index + 1):
                out.append(ind * (depth + 1))
                out.append(gap_marker(orig_index - prev_index - 1))
                out.append(nl)
            if "\n" in item or "\r" in item:
                out.append(item)
            elif ckind in (K_ARRAY, K_OBJECT):
                out.append(item)
            else:
                out.append(ind * (depth + 1))
                out.append(item)
            if i + 1 < kept:
                out.append(",")
            out.append(nl)
            prev_index = orig_index
        if not cfg.prefer_tail_arrays:
            push_omitted()
        out.append(ind * depth)
        out.append("]")
        return "".join(out)

    # ---- yaml template (templates/yaml.rs) ----

    _YAML_RESERVED = {"true", "false", "null", "~", "yes", "no", "on",
                      "off", "y", "n"}
    _YAML_PUNCT = set(":#{}[],&*?|>@%!")

    def _yaml_needs_quotes_value(self, s: str) -> bool:
        if (s == "" or "\n" in s or "\r" in s
                or s[:1].isspace() or s[-1:].isspace()
                or s.lower() in self._YAML_RESERVED):
            return True
        c0 = s[0]
        if c0 in "-+" or c0.isdigit():
            if c0.isascii():
                has_digit = False
                ok = True
                for ch in s:
                    if ch.isascii() and ch.isdigit():
                        has_digit = True
                    elif ch in ".eE+-":
                        pass
                    else:
                        ok = False
                        break
                if ok and has_digit and (c0 in "-+" or c0.isdigit()):
                    return True
        return any(ch in self._YAML_PUNCT for ch in s)

    def _yaml_needs_quotes_key(self, s: str) -> bool:
        if not s:
            return True
        first = s[0]
        if (first.isascii() and first.isdigit()) or first == "-" \
                or first.isspace():
            return True
        if s.lower() in self._YAML_RESERVED:
            return True
        if s[-1:].isspace():
            return True
        return not all(
            (c.isascii() and (c.isalnum())) or c in "_-" for c in s)

    def _yaml_scalar(self, token: str) -> str:
        # token is a rendered leaf: JSON string literal or atomic token
        if token.startswith('"'):
            try:
                raw = json.loads(token)
            except Exception:
                return token
            if isinstance(raw, str) and not self._yaml_needs_quotes_value(
                    raw):
                return raw
            return token
        return token

    def _render_array_yaml(self, children, kept, omitted, depth,
                           inline) -> str:
        cfg = self.cfg
        ind = cfg.indent_unit
        nl = cfg.newline
        out: list[str] = []
        if kept == 0:
            if not inline:
                out.append(ind * depth)
            out.append("[]")
            return "".join(out)

        def omitted_comment():
            if cfg.style == "strict" or omitted <= 0:
                return
            out.append(ind * depth)
            if cfg.style == "default":
                out.append("# …")
            else:
                out.append(f"# {omitted} more items")
            out.append(nl)

        if cfg.prefer_tail_arrays:
            omitted_comment()
        for _, _, item in children:
            if "\n" not in item and "\r" not in item:
                out.append(ind * depth)
                out.append("- ")
                out.append(self._yaml_scalar(item.strip()))
                out.append(nl)
            else:
                lines = item.splitlines()
                if lines:
                    out.append(ind * depth)
                    out.append("- ")
                    out.append(lines[0].lstrip())
                    out.append(nl)
                for rest in lines[1:]:
                    out.append(ind * depth)
                    out.append("  ")
                    out.append(rest.lstrip())
                    out.append(nl)
        if not cfg.prefer_tail_arrays:
            omitted_comment()
        return "".join(out)

    def _render_object_yaml(self, inc, kept, omitted, depth, inline,
                            fileset_root) -> str:
        cfg = self.cfg
        ind = cfg.indent_unit
        nl = cfg.newline
        out: list[str] = []
        if kept == 0:
            if not inline:
                out.append(ind * depth)
            out.append("{}")
            return "".join(out)
        for c in inc:
            raw_key = self.po.key[c] or ""
            key_text = (raw_key if not self._yaml_needs_quotes_key(raw_key)
                        else json_key(raw_key))
            v = self.render_node(c, depth + 1, True, "yaml")
            out.append(ind * depth)
            out.append(key_text)
            if "\n" not in v and "\r" not in v:
                out.append(": ")
                out.append(self._yaml_scalar(v))
                out.append(nl)
            else:
                out.append(":")
                out.append(nl)
                out.append(v)
                if not v.endswith(("\n", "\r")):
                    out.append(nl)
        if omitted > 0 and cfg.style != "strict":
            out.append(ind * depth)
            if cfg.style == "default":
                out.append("# …")
            else:
                label = "files" if fileset_root else "properties"
                out.append(f"# {omitted} more {label}")
            out.append(nl)
        return "".join(out)

    # ---- object rendering ----

    def render_object(self, pq_id: int, depth: int, inline: bool,
                      template: str) -> str:
        cfg = self.cfg
        if pq_id == 0 and self.po.is_fileset and cfg.newline != "":
            return self.render_fileset_sections(depth)
        # Auto resolves by style for objects (serialization/mod.rs:139-152)
        if template == "auto":
            template = _STYLE_TO_JSON_TEMPLATE[cfg.style]
        if template == "text":
            template = "pseudo"  # templates/text.rs:36-43 delegates
        inc = self._included_children(pq_id)
        kept = len(inc)
        omitted = self._omitted_for(pq_id, kept)
        fileset_root = pq_id == 0 and self.po.is_fileset
        if template == "yaml":
            if not (cfg.newline == "" and cfg.indent_unit == ""):
                return self._render_object_yaml(inc, kept, omitted, depth,
                                                inline, fileset_root)
            template = "json"  # compact yaml falls back (yaml.rs:256-259)
        label = "files" if fileset_root else "properties"
        ind = cfg.indent_unit
        nl = cfg.newline
        out = []
        if kept == 0:
            if not inline:
                out.append(ind * depth)
            if template == "pseudo" and omitted > 0:
                out.append("{" + cfg.space + OMISSION + cfg.space + "}")
            elif template == "js" and omitted > 0:
                out.append("{" + cfg.space
                           + f"/* {omitted} more {label} */"
                           + cfg.space + "}")
            else:
                out.append("{}")
            return "".join(out)
        if not inline:
            out.append(ind * depth)
        out.append("{")
        out.append(nl)
        for i, c in enumerate(inc):
            out.append(ind * (depth + 1))
            out.append(json_key(self.po.key[c] or ""))
            out.append(":")
            out.append(cfg.space)
            out.append(self.render_node(c, depth + 1, True, template))
            if i + 1 < kept:
                out.append(",")
            out.append(nl)
        if omitted > 0:
            if template == "pseudo":
                out.append(ind * (depth + 1))
                out.append(OMISSION)
                out.append(nl)
            elif template == "js":
                out.append(ind * (depth + 1))
                out.append(f"/* {omitted} more {label} */")
                out.append(nl)
        out.append(ind * depth)
        out.append("}")
        return "".join(out)

    # ---- fileset sections (fileset.rs:21-106) ----

    def render_fileset_sections(self, depth: int) -> str:
        cfg = self.cfg
        po = self.po
        out = []
        kids = po.children[0] or []
        kept = 0
        for c in kids:
            if self.eff_rank[c] >= self.k:
                continue
            if kept > 0:
                out.append(cfg.newline)
                out.append(cfg.newline)
            kept += 1
            key = po.key[c] or ""
            out.append(cfg.indent_unit * depth)
            out.append(f"==> {key} <==")
            out.append(cfg.newline)
            tmpl = self._fileset_child_template(key)
            out.append(self.render_node(c, depth, False, tmpl))
        total = po.total_len[0]
        if total is None:
            total = len(kids)
        if total > kept and cfg.newline != "":
            out.append(cfg.newline)
            out.append(cfg.newline)
            out.append(cfg.indent_unit * depth)
            out.append(f"==> {total - kept} more files <==")
        return "".join(out)

    def _fileset_child_template(self, name: str) -> str:
        if self.cfg.template != "auto":
            return self.cfg.template
        lower = name.lower()
        if lower.endswith((".yaml", ".yml")):
            return "yaml"
        if lower.endswith(".json"):
            return _STYLE_TO_JSON_TEMPLATE[self.cfg.style]
        return "text"

    # ---- dispatch ----

    def render_node(self, pq_id: int, depth: int, inline: bool,
                    template: str) -> str:
        kind = self.po.kind[pq_id]
        if kind == K_ARRAY:
            return self.render_array(pq_id, depth, inline, template)
        if kind == K_OBJECT:
            return self.render_object(pq_id, depth, inline, template)
        if kind == K_STRING:
            return self.serialize_string(pq_id, template)
        if kind == K_ATOMIC:
            return self.po.value[pq_id] or ""
        raise AssertionError("LeafPart should never be rendered")


def render_top_k(po: PriorityOrder, k: int, cfg: RenderConfig,
                 rset: RenderSet | None = None,
                 escaped_cache: dict | None = None) -> str:
    if rset is None:
        rset = RenderSet(po)
    k = min(k, len(po.by_priority))
    r = _Renderer(po, cfg, rset, k, escaped_cache)
    return r.render_node(0, 0, False, cfg.template)


def find_largest_render_under_budget(po: PriorityOrder, cfg: RenderConfig,
                                     budget: int) -> str:
    """Binary-search max k whose rendered BYTE length fits (lib.rs:117-179).

    The flag array and escaped-string cache are shared across probes
    (the reference's epoch-stamped inclusion flags, lib.rs:132-136).

    NOTE: the probe sequence must be EXACTLY the reference's
    binary_search_max (utils/search.rs:2-18). The fits-predicate is not
    monotone in k (a truncated string's "…" can be longer than the
    content a larger k restores), so on non-monotone stretches the search
    result depends on the probe order — any "smarter" search (galloping,
    hints) can land on a different locally-maximal k and diverge from the
    reference byte-for-byte.
    """
    pump = po.pump
    lazy = (pump is not None and po.assignable_capped is not None
            and max(budget, 1) <= po.pop_limit)
    if lazy:
        # hi without popping: total_nodes after a full bounded expansion
        # is min-clamped by budget anyway once >= budget ids exist, and
        # count_assignable is exact below pop_limit (>= budget here) —
        # see the proof in build_order's docstring / count_assignable
        total = po.assignable_capped
    else:
        if pump is not None:
            pump(po.pop_limit)  # lazy order, out-of-contract budget:
            #                     fall back to the eager expansion
        total = po.total_nodes
    if total == 0:
        return ""
    rset = RenderSet(po)
    escaped: dict[int, str] = {}
    lo, hi = 1, min(total, max(budget, 1))
    best_render = None
    while lo <= hi:
        mid = (lo + hi) // 2
        if lazy and len(po.by_priority) < mid:
            pump(mid)
            rset.sync()
        s = render_top_k(po, mid, cfg, rset, escaped)
        if len(s.encode("utf-8")) <= budget:
            best_render = s
            lo = mid + 1
        else:
            hi = mid - 1
    if best_render is not None:
        return best_render
    return render_top_k(po, 1, cfg, rset, escaped)
