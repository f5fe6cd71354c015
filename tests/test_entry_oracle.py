"""The big gate: every queries() entry with an oracle must match DuckDB
exactly (count, schema, values) — mirroring the driver's t2 check."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle import compare, duck_con  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_queries_manifest_fresh():
    """QUERIES.json at the repo root must match manifest() exactly
    (regenerate with `python make_queries_manifest.py`), and every
    rows-only query must carry a documented rationale."""
    import json
    import pathlib

    path = pathlib.Path(__file__).parent.parent / "QUERIES.json"
    on_disk = json.loads(path.read_text())
    assert on_disk == entrymod.manifest(), (
        "QUERIES.json is stale — run `python make_queries_manifest.py`"
    )
    assert set(on_disk["rows_only"]) == set(entrymod.ROWS_ONLY_RATIONALE)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    issues = compare(df, ORACLES[name], con)
    assert not issues, f"{name}: {issues[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
