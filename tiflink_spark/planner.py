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
AVG | MIN | MAX, and the reference's flagship correlated-COUNT shape

    SELECT d.c1[, ...], (SELECT count(*) FROM fact f
                         WHERE f.fk = d.dk) AS alias
    FROM dim d

(TiFlinkExample.java:10-16 — decorrelated to dim ⟕ COUNT-GROUP-BY-fk),
routing both to :class:`tiflink_spark.mv.IncrementalAggMV` (per-batch
work ∝ changed keys; the dim-joined form also takes dim changelogs).
Anything else — other joins, subqueries, WHERE/HAVING, expressions over
group keys — falls back to :class:`tiflink_spark.mv.RecomputeMV`, the
explicitly-marked recompute maintenance mode. A planner miss is never
wrong, only slower: both strategies converge to the batch answer after
every micro-batch (property-tested in tests/test_mv_convergence.py).

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
    rf"(?:\s+WHERE\s+(?P<where>.+?))?"
    rf"\s+GROUP\s+BY\s+(?P<keys>{_IDENT}(?:\s*,\s*{_IDENT})*)"
    rf"(?:\s+HAVING\s+(?P<having>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_SQL_KEYWORDS = frozenset(
    "and or not null is in between like true false".split()
)

# A WHERE clause stays incremental only if it is row-local AND
# deterministic: no subquery, no aggregate (those make the predicate
# depend on other rows), and no non-deterministic / clock functions —
# the filtered bootstrap and the per-batch changelog filter evaluate
# the predicate at different times, so rand()/now()-style predicates
# would diverge from batch semantics.
_NON_LOCAL_WHERE = re.compile(
    r"\(\s*SELECT\b|\b(?:count|sum|avg|min|max)\s*\("
    r"|\b(?:rand|randn|random|uuid|shuffle|now|current_timestamp|"
    r"current_date|current_time|localtimestamp|unix_timestamp)(?:\s*\(|\b)",
    re.IGNORECASE,
)

_AGG_RE = re.compile(
    rf"^(?P<kind>count|sum|avg|min|max)\s*\(\s*"
    rf"(?P<arg>\*|(?:DISTINCT\s+)?{_IDENT})\s*\)\s+AS\s+(?P<alias>{_IDENT})$",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class AggShape:
    """A query matched to the incremental-aggregate maintenance shape.

    ``where`` (row-local predicate or None) is maintained by the
    stateless-filter changelog rule (changelog.apply_filter): the fact
    bootstrap is filtered, and +I/+U change rows failing the predicate
    demote to -D. ``having`` (alias-form predicate over the OUTPUT
    columns, or None) is the same rule applied on the target side: a
    group leaving the predicate leaves the view.
    """

    fact: str
    group_keys: tuple[str, ...]
    measures: tuple[Measure, ...]
    where: str | None = None
    having: str | None = None


@dataclass(frozen=True)
class CorrelatedCountShape:
    """The reference's flagship shape (TiFlinkExample.java:10-16):

        SELECT d.c1[, d.c2 ...],
               (SELECT count(*) FROM fact f WHERE f.fk = d.dk) AS alias
        FROM dim d

    Decorrelates to dim ⟕ (COUNT GROUP BY fk) — exactly the dim-joined
    IncrementalAggMV, whose LEFT-JOIN count coalesces to 0 just as the
    correlated subquery does for dims with no fact rows.
    """

    dim: str
    dim_key: str
    dim_cols: tuple[str, ...]  # non-key dim output columns
    fact: str
    fact_key: str  # the correlation column on the fact side
    alias: str


@dataclass(frozen=True)
class JoinShape:
    """A two-sided equi-join matched to IncrementalJoinMV maintenance:

        SELECT c1[, c2 ...] FROM left JOIN right USING (k)

    Changelogs on BOTH sides maintain the view by dirty-join-key
    recompute (per-batch work ∝ row volume of touched join keys).
    """

    left: str
    right: str
    join_key: str
    out_cols: tuple[str, ...]


_JOIN_RE = re.compile(
    rf"^\s*SELECT\s+(?P<select>(?:{_IDENT}\s*,\s*)*{_IDENT})\s+"
    rf"FROM\s+(?P<left>{_IDENT})\s+JOIN\s+(?P<right>{_IDENT})\s+"
    rf"USING\s*\(\s*(?P<key>{_IDENT})\s*\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def match_join_shape(query: str, source_names: set[str]) -> JoinShape | None:
    """Match the bare inner equi-join (USING form, bare-identifier
    select list), or None. The USING form guarantees the join key is
    same-named on both sides — the contract IncrementalJoinMV keys its
    dirty-key pruning on."""
    m = _JOIN_RE.match(query)
    if m is None:
        return None
    left, right = m.group("left"), m.group("right")
    if left not in source_names or right not in source_names or left == right:
        return None
    cols = tuple(c.strip() for c in m.group("select").split(","))
    return JoinShape(left, right, m.group("key"), cols)


# SELECT d-col-list, (SELECT count(*) FROM fact f WHERE f.fk = d.dk) AS a FROM dim d
_CORR_RE = re.compile(
    rf"^\s*SELECT\s+(?P<select>(?:{_IDENT}\s*,\s*)*{_IDENT})\s*,\s*"
    rf"\(\s*SELECT\s+count\s*\(\s*\*\s*\)\s+FROM\s+(?P<fact>{_IDENT})\s+(?P<fa>{_IDENT})\s+"
    rf"WHERE\s+(?P<w1>{_IDENT})\s*\.\s*(?P<c1>{_IDENT})\s*=\s*"
    rf"(?P<w2>{_IDENT})\s*\.\s*(?P<c2>{_IDENT})\s*\)\s+AS\s+(?P<alias>{_IDENT})\s+"
    rf"FROM\s+(?P<dim>{_IDENT})\s+(?P<da>{_IDENT})\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


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


def match_correlated_count_shape(
    query: str, source_names: set[str], dim_pk: dict[str, list[str]]
) -> CorrelatedCountShape | None:
    """Match the flagship correlated-COUNT shape, or None.

    ``dim_pk`` maps source name → declared PK columns; the dim side must
    have a single-column PK that appears in the select list (the MV is
    keyed by it), and the correlation must equate a fact column with
    that dim's PK across the two table aliases.
    """
    m = _CORR_RE.match(query)
    if m is None:
        return None
    fact, dim = m.group("fact"), m.group("dim")
    if fact not in source_names or dim not in source_names or fact == dim:
        return None
    fa, da = m.group("fa").lower(), m.group("da").lower()
    sides = {m.group("w1").lower(): m.group("c1"), m.group("w2").lower(): m.group("c2")}
    if set(sides) != {fa, da}:
        return None
    fact_key, dim_corr = sides[fa], sides[da]
    pk = dim_pk.get(dim) or []
    if len(pk) != 1 or pk[0].lower() != dim_corr.lower():
        return None
    sel = [c.strip() for c in m.group("select").split(",")]
    if pk[0].lower() not in [c.lower() for c in sel]:
        return None
    dim_cols = tuple(c for c in sel if c.lower() != pk[0].lower())
    return CorrelatedCountShape(dim, pk[0], dim_cols, fact, fact_key, m.group("alias"))


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
    where = m.group("where")
    if where is not None and _NON_LOCAL_WHERE.search(where):
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
    # A measure alias shadowing a group key would make the output
    # column set ambiguous (and any HAVING over it unresolvable as a
    # target-side filter) — not this shape.
    if {mm.alias.lower() for mm in measures} & {k.lower() for k in keys}:
        return None
    having = m.group("having")
    if having is not None:
        # HAVING must be in alias form over the MV's output columns.
        # Reject aggregate calls FIRST: an alias shadowing a function
        # name (count(*) AS count ... HAVING count(*) > 3) would pass
        # the identifier whitelist but fail at bootstrap. Aggregate
        # calls, non-deterministic functions, or unknown identifiers
        # -> not maintainable as a target-side row filter -> fall back.
        if _NON_LOCAL_WHERE.search(having):
            return None
        out_cols = {k.lower() for k in keys} | {mm.alias.lower() for mm in measures}
        idents = set(re.findall(_IDENT, having))
        if any(i.lower() not in out_cols | _SQL_KEYWORDS for i in idents):
            return None
        having = having.strip()
    return AggShape(
        m.group("table"),
        tuple(keys),
        tuple(measures),
        where.strip() if where is not None else None,
        having,
    )
