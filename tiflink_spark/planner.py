"""Maintenance-strategy planner: choose HOW an MV is maintained.

The reference delegates incremental planning wholesale to Flink's
update-mode StreamSQL planner (TiFlinkApp.java:270); SURVEY §4 assigns
the same job to "our API layer for the supported query shapes". This is
that layer: a conservative shape-matcher that recognizes the canonical
single-table aggregate

    SELECT g1[, g2 ...], agg(col) AS alias[, ...]
    FROM fact
    GROUP BY g1[, g2 ...]

with aggregates in COUNT(*) | COUNT(col) | COUNT(DISTINCT col) | SUM |
AVG | MIN | MAX, and routes it to :class:`tiflink_spark.mv.IncrementalAggMV`
(per-batch work ∝ changed keys). Anything else — joins, subqueries,
WHERE/HAVING, expressions over group keys — falls back to
:class:`tiflink_spark.mv.RecomputeMV`, the explicitly-marked recompute
maintenance mode. A planner miss is never wrong, only slower: both
strategies converge to the batch answer after every micro-batch
(property-tested in tests/test_mv_convergence.py).

The GROUP BY keys double as the MV's primary key: a GROUP BY's key set
IS the query's derived unique constraint, which is exactly the PK
inference rule the reference applies before falling back to
first-output-column (TiFlinkApp.java:276-281).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from tiflink_spark.incremental import Measure

_IDENT = r"[A-Za-z_]\w*"

_SHAPE_RE = re.compile(
    rf"^\s*SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<table>{_IDENT})"
    rf"\s+GROUP\s+BY\s+(?P<keys>{_IDENT}(?:\s*,\s*{_IDENT})*)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_AGG_RE = re.compile(
    rf"^(?P<kind>count|sum|avg|min|max)\s*\(\s*"
    rf"(?P<arg>\*|(?:DISTINCT\s+)?{_IDENT})\s*\)\s+AS\s+(?P<alias>{_IDENT})$",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class AggShape:
    """A query matched to the incremental-aggregate maintenance shape."""

    fact: str
    group_keys: tuple[str, ...]
    measures: tuple[Measure, ...]


def _split_select_list(select: str) -> list[str]:
    """Split a select list on top-level commas (commas inside parens —
    e.g. a future multi-arg function — stay within their item)."""
    items, depth, cur = [], 0, []
    for ch in select:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur).strip())
    return items


def match_agg_shape(query: str, source_names: set[str]) -> AggShape | None:
    """Return the matched aggregate shape, or None for the fallback.

    Conservative by construction: the FROM clause must be exactly one
    registered source name directly followed by GROUP BY (so any WHERE,
    JOIN, or derived table breaks the match), the leading select items
    must be the bare group-key identifiers in order, and every remaining
    item must be a single supported aggregate with an alias.
    """
    m = _SHAPE_RE.match(query)
    if m is None or m.group("table") not in source_names:
        return None
    keys = [k.strip() for k in m.group("keys").split(",")]
    items = _split_select_list(m.group("select"))
    if len(items) <= len(keys):
        return None
    if [i.lower() for i in items[: len(keys)]] != [k.lower() for k in keys]:
        return None
    measures = []
    for item in items[len(keys) :]:
        am = _AGG_RE.match(item)
        if am is None:
            return None
        kind, arg = am.group("kind").lower(), am.group("arg")
        if arg == "*":
            if kind != "count":
                return None  # sum(*) etc. is not SQL
            col = None
        elif re.match(r"(?i)^DISTINCT\s", arg):
            if kind != "count":
                return None  # only COUNT(DISTINCT) is supported
            kind, col = "count_distinct", arg.split()[-1]
        else:
            col = arg
        measures.append(Measure(kind, col, am.group("alias")))
    return AggShape(m.group("table"), tuple(keys), tuple(measures))
