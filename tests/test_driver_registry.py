"""Driver-contract registry invariants: every queries() name has an
oracle, the verify-priority list references only real queries (a typo
would silently waste one of the driver's ~50 snapshot slots), and the
never-snapshotted names come first."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_priority_names_exist_and_lead():
    import __spark_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    # oracles must reference real queries; queries MAY omit an oracle
    # (the documented rows-only path for non-SQL-expressible ops) —
    # currently none do, but that's a choice, not an invariant
    assert set(o) <= set(q), f"orphan oracles: {set(o) - set(q)}"
    missing = [n for n in m._VERIFY_PRIORITY if n not in q]
    assert not missing, f"_VERIFY_PRIORITY names not registered: {missing}"
    # priority names must actually lead the iteration order
    head = list(q)[: len([n for n in m._VERIFY_PRIORITY if n in q])]
    assert head == [n for n in m._VERIFY_PRIORITY if n in q]
