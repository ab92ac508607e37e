"""Driver-contract registry invariants (__spark_entry__).

The driver truncates queries() at 50 entries, compares each against
oracle_sql() by sorted column names + value hash, and knows nothing
about extra_queries(). These meta-tests pin the rules every rotation
must preserve — cheap (no Spark jobs), so a registry mistake fails in
seconds instead of surfacing as a red driver row a round later.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_gate_is_exactly_the_rotation_list_and_capped():
    q = entry_mod.queries()
    assert list(q) == entry_mod._GATE_R5
    assert len(q) <= 50, "driver truncates at 50 — entries past the cap get no verdict"
    assert len(q) == len(set(q)), "duplicate gate names"


def test_gate_and_extras_partition_the_registry():
    q, xq = entry_mod.queries(), entry_mod.extra_queries()
    assert not set(q) & set(xq), "a query must live in exactly one registry"
    fns = entry_mod._all_query_fns()
    assert set(q) | set(xq) == set(fns)
    assert all(callable(f) for f in fns.values())


def test_every_gated_query_has_an_oracle():
    # a gated query without an oracle_sql twin gets only the weak
    # rows-only driver check — every gate slot must carry the full gate
    q, orc = entry_mod.queries(), entry_mod.oracle_sql()
    missing = [k for k in q if k not in orc]
    assert not missing, f"gated without oracle: {missing}"
    assert set(orc) <= set(q), "oracle_sql keys must be a subset of queries()"


def test_extra_oracles_cover_extras():
    xq, xorc = entry_mod.extra_queries(), entry_mod.extra_oracle_sql()
    assert set(xorc) <= set(xq)
    # the local gate (scripts/check_correctness.py) relies on extras
    # keeping full oracles — rows-only extras would silently weaken it
    missing = [k for k in xq if k not in xorc]
    assert not missing, f"extras without oracle: {missing}"
