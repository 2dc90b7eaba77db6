"""The driver contract, enforced in-repo: every ``queries()`` entry runs
at sf0.001 and every ``oracle_sql()`` twin must match it value-for-value
(row count + column names + values), exactly as the external driver
compares them at sf0.01.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    return E


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(entrymod):
    df = entrymod.entry()
    assert len(df) > 0


def test_every_query_runs_and_oracles_match(entrymod, con):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, fn in qs.items():
        got = fn(SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        assert len(got) >= 0, name
        if name not in oracles:
            continue
        want = con.execute(oracles[name]).df()
        try:
            pd.testing.assert_frame_equal(
                _norm(got), _norm(want), check_dtype=False
            )
        except AssertionError as e:
            failures.append((name, str(e).splitlines()[0]))
    assert not failures, failures
