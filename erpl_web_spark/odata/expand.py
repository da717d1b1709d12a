"""$expand option parser (reference: odata_expand_parser.cpp, 249 LoC;
struct odata_expand_parser.hpp:10-32).

Grammar: comma-separated paths; each path may carry parenthesized options
``Name($select=a,b;$expand=Child)`` and nested sub-paths ``A/B``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ExpandPath:
    path: str                      # e.g. "Orders" or "Orders/Customer"
    options: dict[str, str] = field(default_factory=dict)
    children: list["ExpandPath"] = field(default_factory=list)


def _split_top_level(s: str, sep: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def parse_expand(expr: str | None) -> list[ExpandPath]:
    if not expr:
        return []
    out: list[ExpandPath] = []
    for item in _split_top_level(expr, ","):
        name, options, children = item, {}, []
        if "(" in item and item.endswith(")"):
            name, _, rest = item.partition("(")
            inner = rest[:-1]
            for opt in _split_top_level(inner, ";"):
                k, _, v = opt.partition("=")
                k = k.strip()
                if k == "$expand":
                    children = parse_expand(v)
                else:
                    options[k] = v.strip()
        path = name.strip()
        if "/" in path:  # nested path sugar: A/B == A($expand=B)
            head, _, tail = path.partition("/")
            child = parse_expand(tail)
            out.append(ExpandPath(head, {}, child))
        else:
            out.append(ExpandPath(path, options, children))
    return out
