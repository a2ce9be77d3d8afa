"""Unit tests for the shared OOM-surviving DuckDB oracle holder
(tools/duck_oracle.py) — scripted-connection fakes drive the OOM paths
deterministically, covering both consumers (oracle_check + parity gate)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import duck_oracle
from tools.duck_oracle import STEADY_BUDGET, DuckOracle


class _FakeResult:
    def __init__(self, tag):
        self.description = [("x",)]
        self._tag = tag

    def fetchall(self):
        return [(self._tag,)]


class _FakeCon:
    def __init__(self, budget, fail_budgets):
        self.budget = budget
        self.fail_budgets = fail_budgets
        self.closed = False

    def execute(self, sql):
        if self.budget in self.fail_budgets:
            raise duckdb.OutOfMemoryException("scripted OOM")
        return _FakeResult(self.budget)

    def close(self):
        self.closed = True


@pytest.fixture
def scripted(monkeypatch):
    """Patch duck_connect to hand out fakes; returns the mutable set of
    budgets that OOM and the list of created connections."""
    fail: set = set()
    made: list = []

    def fake_connect(sf_dir, memory_limit=STEADY_BUDGET, threads=8):
        con = _FakeCon(memory_limit, fail)
        made.append(con)
        return con

    monkeypatch.setattr(duck_oracle, "duck_connect", fake_connect)
    return fail, made


def test_healthy_connection_is_reused(scripted):
    fail, made = scripted
    o = DuckOracle("/nowhere")
    assert o.run("q1") == ([(STEADY_BUDGET,)], ["x"])
    assert o.run("q2") == ([(STEADY_BUDGET,)], ["x"])
    assert len(made) == 1  # no reconnect churn when nothing OOMs


def test_oom_heals_on_fresh_connection(scripted):
    fail, made = scripted
    o = DuckOracle("/nowhere")
    wedged = o.con
    # only the original (wedged) connection OOMs; the 24GB retry rung's
    # fresh connection succeeds
    orig_execute = _FakeCon.execute

    def execute_once_then_ok(self, sql):
        if self is wedged:
            raise duckdb.OutOfMemoryException("wedged")
        return _FakeResult(self.budget)

    _FakeCon.execute = execute_once_then_ok
    try:
        rows, cols = o.run("q")
    finally:
        _FakeCon.execute = orig_execute
    assert rows == [(STEADY_BUDGET,)]
    assert wedged.closed  # the wedged connection was closed, not reused
    assert o.con is not wedged


def test_shrunk_rung_succeeds_then_budget_restored(scripted):
    fail, made = scripted
    fail.add(STEADY_BUDGET)  # 24GB always OOMs; only the 8GB rung works
    o = DuckOracle("/nowhere")
    rows, cols = o.run("q")
    assert rows == [("8GB",)]  # the shrunken rung produced the result
    # and the holder healed back to the steady budget for later queries
    assert o.con.budget == STEADY_BUDGET
    fail.clear()
    assert o.run("q2") == ([(STEADY_BUDGET,)], ["x"])


def test_all_rungs_exhausted_raises(scripted):
    fail, made = scripted
    fail.update({STEADY_BUDGET, "8GB"})
    o = DuckOracle("/nowhere")
    with pytest.raises(duckdb.OutOfMemoryException):
        o.run("q")
