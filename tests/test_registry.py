"""Registry integrity (r5 judge brief #2): the queries() dict's first
50 keys ARE the driver's correctness window, and duplicate literal
keys silently collapse — both must be pinned by assertion, not
convention.  No SparkSession needed."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_registry_window_pinned_and_duplicate_free():
    import __spark_entry__ as entry_mod
    from scripts.check_oracle import check_registry

    check_registry(entry_mod)


def test_window_is_oracle_backed():
    """Every driver-window slot must hash-check (constraint (a) of the
    window contract): a rows-only id in the window wastes a slot on a
    weaker check."""
    import __spark_entry__ as entry_mod

    oracles = set(entry_mod.oracle_sql())
    missing = [k for k in entry_mod.DRIVER_WINDOW if k not in oracles]
    assert not missing, f"rows-only ids in the driver window: {missing}"
