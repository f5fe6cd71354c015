"""Guards for the round-11 test-gate tiering: the frozen SLOW_TESTS id
list (tests/conftest.py) must keep pointing at tests that exist —
a renamed or deleted test would otherwise silently fall back into (or
out of) the default tier. Pure-Python, no Spark session."""

from __future__ import annotations

import importlib
import re

from tests.conftest import SLOW_TESTS


def test_slow_list_is_current():
    import __spark_entry__ as entrymod

    oracles = set(entrymod.oracle_sql())
    rows_only = set(entrymod.queries()) - oracles
    for nodeid in sorted(SLOW_TESTS):
        m = re.match(r"([\w.]+)::(\w+)(?:\[(.+)\])?$", nodeid)
        assert m, f"unparseable SLOW_TESTS id: {nodeid}"
        fname, test, param = m.groups()
        mod = importlib.import_module("tests." + fname.removesuffix(".py"))
        assert hasattr(mod, test), f"{nodeid}: no such test function"
        if test == "test_oracle_match":
            assert param in oracles, f"{nodeid}: not an oracle query"
        elif test == "test_rows_only_queries_run":
            assert param in rows_only, f"{nodeid}: not a rows-only query"


def test_default_tier_keeps_the_gate_meaningful():
    """The default tier must still value-check the vast majority of
    oracles: the slow tier may hold at most 40 of the 268+ oracle
    tests, and never the driver-facing contract tests (bench line,
    manifest freshness, entry smoke)."""
    slow_oracles = [
        s for s in SLOW_TESTS if "test_oracle_match[" in s
    ]
    assert len(slow_oracles) <= 40, len(slow_oracles)
    for must_stay in (
        "test_entry_oracle.py::test_entry_smoke",
        "test_entry_oracle.py::test_queries_manifest_fresh",
        "test_entry_oracle.py::test_all_oracle_keys_have_queries",
    ):
        assert must_stay not in SLOW_TESTS
    assert not any("test_bench_line" in s for s in SLOW_TESTS)
