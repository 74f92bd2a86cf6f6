"""Resumability (north_rule): a sync interrupted mid-pipeline and re-run
produces identical triples to an uninterrupted one."""

import shutil
import tempfile

from pyspark.sql import functions as F

from cartography_spark.core.store import GraphStore
from cartography_spark.kg.pipeline import run_sync
from cartography_spark.modules import aws_iam
from cartography_spark.modules.aws_base import sync_accounts
from cartography_spark.sources import fixtures as fx
from tests.conftest import SF_DIR

T1 = 111111111


def _triples(store) -> set[tuple]:
    return {
        (r.src_id, r.rel_label, r.dst_id)
        for r in store.edges().select("src_id", "rel_label", "dst_id").collect()
    }


def _node_state(store) -> set[tuple]:
    return {
        (r.id, r.label, r.firstseen, r.lastupdated)
        for r in store.nodes().select("id", "label", "firstseen", "lastupdated").collect()
    }


def test_resume_mid_pipeline_identical_triples(spark):
    r1 = tempfile.mkdtemp(prefix="full_")
    r2 = tempfile.mkdtemp(prefix="resumed_")
    try:
        # uninterrupted reference run
        full = GraphStore(spark, r1, write_partitions=2)
        run_sync(spark, full, SF_DIR, T1, with_github=False, with_documents=False)

        # "killed" run: only the first few stages committed...
        resumed = GraphStore(spark, r2, write_partitions=2)
        sync_accounts(resumed, fx.aws_accounts(spark, SF_DIR), T1)
        aws_iam.sync_principals(
            resumed,
            fx.iam_users(spark, SF_DIR),
            fx.iam_groups(spark, SF_DIR),
            fx.iam_roles(spark, SF_DIR),
            T1,
        )
        # ...then the pipeline restarts from the top with the same tag
        run_sync(spark, resumed, SF_DIR, T1, with_github=False, with_documents=False)

        assert _triples(resumed) == _triples(full)
        assert _node_state(resumed) == _node_state(full)
    finally:
        shutil.rmtree(r1, ignore_errors=True)
        shutil.rmtree(r2, ignore_errors=True)
