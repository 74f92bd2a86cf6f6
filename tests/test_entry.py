"""Driver-contract smoke: entry() + a sampled query/oracle comparison.

The exhaustive gate is tools/oracle_check.py (all queries at sf0.01);
keeping a cheap sample here ensures `pytest -x -q` alone catches contract
breakage."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

SAMPLE = [
    "kg_aws_core_family",  # family consolidation: encoding parity end-to-end
    "kg_mentions",
    "text_stats_family",  # fixed-point double codec parity end-to-end
    "pack_stats",
    "dedup_prefix",
    "kg_exposure",
]


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
    assert 30 <= len(qs) <= 50  # the driver gate checks the first 50 entries
    missing_oracle = set(qs) - set(oracles)
    assert not missing_oracle  # every gate entry has an exact oracle


def test_family_consolidation_covers_every_member():
    """No member query or oracle may be silently dropped by consolidation."""
    members = entrymod._member_queries()
    member_sqls = entrymod._member_oracle_sql()
    qs = entrymod.queries()
    consolidated = set(entrymod._CONSOLIDATED)
    # every member is either standalone in queries() or inside exactly one family
    in_families = [m for ms in entrymod._FAMILIES.values() for m in ms]
    assert len(in_families) == len(set(in_families))  # no double membership
    assert set(in_families) == consolidated
    assert set(members) == consolidated | (set(qs) - set(entrymod._FAMILIES))
    # every consolidated member has an oracle and a static column map
    for m in consolidated:
        assert m in member_sqls, m
        assert m in entrymod._FAMILY_COLS, m


def test_permission_registry_any_of_semantics(spark, monkeypatch):
    """A mapping listing several permissions grants the relationship when ANY
    of them is allowed (reference permission_relationships.py
    evaluate_policy_for_permissions loops all of them) — a second permission
    added to permission_relationships.json must widen the result set."""
    from cartography_spark.modules import permissions as perms

    base = [
        {
            "permissions": ["sqs:SendMessage"],
            "target_label": "SQSQueue",
            "relationship_name": "CAN_SEND",
        }
    ]
    multi = [
        {
            # the granting permission listed SECOND: the pre-fix code
            # evaluated only permissions[0] (nobody holds ReceiveMessage in
            # the fixtures) and returned an empty set
            "permissions": ["sqs:ReceiveMessage", "sqs:SendMessage"],
            "target_label": "SQSQueue",
            "relationship_name": "CAN_SEND",
        }
    ]

    def run(mappings):
        monkeypatch.setattr(perms, "load_permission_mappings", lambda path=None: mappings)
        df = entrymod._q_kg_permission_registry(spark, SF_DIR)
        return {(r.principal_arn, r.resource_arn) for r in df.collect()}

    single = run(base)
    assert single  # the fixture grant exists
    assert run(multi) == single  # any-of: order/position must not matter
    # and duplicated permissions do not duplicate pairs
    dup = run([{**base[0], "permissions": ["sqs:SendMessage", "sqs:SendMessage"]}])
    assert dup == single


@pytest.mark.parametrize("name", SAMPLE)
def test_sampled_query_matches_oracle(spark, name):
    from tools.oracle_check import normalize

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs[name](spark, SF_DIR).toPandas()
    exp = _con(SF_DIR).execute(oracles[name]).df()
    assert sorted(map(str.lower, got.columns)) == sorted(map(str.lower, exp.columns))
    assert normalize(got) == normalize(exp)
