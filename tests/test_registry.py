"""Registry/rotation invariants.

The external correctness driver checks a strict 50-query PREFIX of
``get_registry()`` iteration order; ``_PRIORITY`` is the rotation
policy. Round 8 shipped 52 entries before the window marker, so the
last two silently fell outside the driver's window while the comments
claimed they were in — these tests pin the contract structurally.
"""

from __future__ import annotations

import re

from tiflink_spark import queries

WINDOW = 50
MARKER = "past the 50-query window"


def test_priority_window_is_exactly_50():
    src = open(queries.__file__.rstrip("c")).read()
    start = src.index("_PRIORITY = [")
    marker = src.index(MARKER, start)
    head = src[start:marker]
    names = re.findall(r'^\s*"([a-z0-9_]+)",\s*(?:#.*)?$', head, re.M)
    assert len(names) == WINDOW, (
        f"{len(names)} entries precede the window marker; the driver checks "
        f"exactly {WINDOW} — queries past the marker comment must actually "
        "sit past it"
    )
    # and the source-order prefix agrees with the runtime order
    assert names == queries._PRIORITY[:WINDOW]


def test_registry_prefix_matches_priority():
    reg = list(queries.get_registry())
    assert reg[: len(queries._PRIORITY)] == queries._PRIORITY


def test_priority_has_no_duplicates():
    assert len(queries._PRIORITY) == len(set(queries._PRIORITY))
