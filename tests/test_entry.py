"""Driver-contract smoke: entry() + a sampled query/oracle comparison.

The exhaustive gate is tools/oracle_check.py (all queries at sf0.01);
keeping a cheap sample here ensures `pytest -x -q` alone catches contract
breakage."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

SAMPLE = ["kg_accounts", "kg_mentions", "text_fingerprint", "dedup_prefix", "kg_exposure"]


def _con(sf_dir):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "doc_id", "rel_label", "entity_id", "entity_label", "n_mentions", "first_span_idx",
    }


def test_every_query_has_callable(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    missing_oracle = set(qs) - set(oracles)
    assert missing_oracle <= {"sim_ann_lsh"}  # approximate op: rows-only


@pytest.mark.parametrize("name", SAMPLE)
def test_sampled_query_matches_oracle(spark, name):
    from tools.oracle_check import normalize

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs[name](spark, SF_DIR).toPandas()
    exp = _con(SF_DIR).execute(oracles[name]).df()
    assert sorted(map(str.lower, got.columns)) == sorted(map(str.lower, exp.columns))
    assert normalize(got) == normalize(exp)
