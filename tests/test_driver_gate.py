"""Driver-gate invariants + the 8 GB oracle memory-budget sweep.

The driver's correctness gate samples the FIRST 50 registered queries, so
`_DRIVER_GATE_FIRST` must (a) fit the cap — round 4 silently lost
`corpus_temperature_mix` at position 51 — (b) contain no duplicates or
unknown names, and (c) actually control registration order.  Separately,
round 4's only red row was the driver's own DuckDB failing a malloc while
re-deriving an unmaterialized CTE chain twice; `tools/oracle_budget_check`
caps every gate oracle at a hard 8 GB (no retry ladder) so memory-hungry
oracle regressions fail pre-commit rather than at judge time.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from tools.oracle_budget_check import sweep


def test_gate_fits_the_50_slot_cap():
    assert len(entrymod._DRIVER_GATE_FIRST) <= 50


def test_gate_has_no_duplicates():
    gate = entrymod._DRIVER_GATE_FIRST
    assert len(set(gate)) == len(gate)


def test_gate_names_all_registered_with_oracles():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    gate = entrymod._DRIVER_GATE_FIRST
    assert [n for n in gate if n not in q] == []
    # every gate slot must carry the HARD hash-match check, not the weaker
    # rows-only fallback — a slot spent on an oracle-less query is wasted
    assert [n for n in gate if n not in o] == []


def test_registration_order_starts_with_the_gate():
    q = entrymod.queries()
    gate = entrymod._DRIVER_GATE_FIRST
    assert list(q.keys())[: len(gate)] == gate


@pytest.mark.slow
def test_gate_oracles_run_at_8gb_budget(sf_dir):
    """Every gate oracle completes under a hard 8 GB cap (no heal ladder)."""
    results = sweep(sf_dir, memory_limit="8GB",
                    names=list(entrymod._DRIVER_GATE_FIRST), verbose=False)
    bad = {k: v for k, v in results.items() if v}
    assert bad == {}
