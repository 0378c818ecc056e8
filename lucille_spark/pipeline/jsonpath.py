"""Nested JSON path get/set/remove — the write side of the reference's
Document nested-JSON API (core/Document.java:612-783: ``Segment.parse``,
``getNestedJson`` / ``setNestedJson`` / ``removeNestedJson``).

Paths use dotted segments; an integer segment (``a.b.2.c``) or bracket
form (``a.b[2].c``) indexes into an array, matching
Document.Segment semantics (AddRandomNestedField.java:198-226 treats
all-digit segments as indexes). Setting through a missing container
creates it (dict for name segments, list extended with nulls for index
segments); removing a missing path is a no-op.

The read side (``get``) mirrors Spark's ``get_json_object``; it exists
here so the pure-Python semantics are testable against the reference's
DocumentTest fixtures.
"""

from __future__ import annotations

import json
import re
from typing import Any, List, Union

Segment = Union[str, int]

_BRACKET = re.compile(r"\[(\d+)\]")


def parse_segments(path: str) -> List[Segment]:
    if not path:
        raise ValueError("empty path")
    # a.b[2].c -> a.b.2.c
    norm = _BRACKET.sub(lambda m: f".{m.group(1)}", path)
    out: List[Segment] = []
    for seg in norm.split("."):
        if seg == "":
            raise ValueError(f"empty segment in path {path!r}")
        out.append(int(seg) if seg.isdigit() else seg)
    return out


def get_path(obj: Any, segments: List[Segment]) -> Any:
    cur = obj
    for s in segments:
        if isinstance(s, int):
            if not isinstance(cur, list) or s >= len(cur):
                return None
            cur = cur[s]
        else:
            if not isinstance(cur, dict) or s not in cur:
                return None
            cur = cur[s]
    return cur


def set_path(obj: Any, segments: List[Segment], value: Any) -> Any:
    """Returns the (possibly new) root with value set; creates missing
    containers (Document.setNestedJson:755-783)."""
    def container_for(seg: Segment):
        return [] if isinstance(seg, int) else {}

    if obj is None:
        obj = container_for(segments[0])
    root = obj
    cur = root
    for i, s in enumerate(segments):
        last = i == len(segments) - 1
        if isinstance(s, int):
            if not isinstance(cur, list):
                raise ValueError(
                    f"segment {s} indexes a non-array at {segments[:i]}")
            while len(cur) <= s:
                cur.append(None)
            if last:
                cur[s] = value
            else:
                if cur[s] is None or not isinstance(
                        cur[s], (dict, list)):
                    cur[s] = container_for(segments[i + 1])
                cur = cur[s]
        else:
            if not isinstance(cur, dict):
                raise ValueError(
                    f"segment {s!r} keys into a non-object at {segments[:i]}")
            if last:
                cur[s] = value
            else:
                nxt = cur.get(s)
                if not isinstance(nxt, (dict, list)):
                    cur[s] = container_for(segments[i + 1])
                cur = cur[s]
    return root


def remove_path(obj: Any, segments: List[Segment]) -> Any:
    """Removes the value at the path (no-op when absent); array removal
    deletes the element (shifting), like JsonNode.remove(int)."""
    parent = get_path(obj, segments[:-1]) if len(segments) > 1 else obj
    last = segments[-1]
    if isinstance(last, int):
        if isinstance(parent, list) and last < len(parent):
            del parent[last]
    else:
        if isinstance(parent, dict):
            parent.pop(last, None)
    return obj


def set_in_json(json_str: str, path: str, value: Any) -> str:
    segs = parse_segments(path)
    obj = json.loads(json_str) if json_str else None
    return json.dumps(set_path(obj, segs, value),
                      separators=(",", ":"), ensure_ascii=False)


def remove_in_json(json_str: str, path: str) -> str:
    if not json_str:
        return json_str
    segs = parse_segments(path)
    obj = json.loads(json_str)
    return json.dumps(remove_path(obj, segs),
                      separators=(",", ":"), ensure_ascii=False)
