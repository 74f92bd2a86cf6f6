"""Documents path: span invariant, extraction parity, linking,
canonicalization, end-to-end triples."""

import pytest
from pyspark.sql import functions as F

from cartography_spark.kg.canonicalize import canonical_mapping, connected_components
from cartography_spark.kg.extract import detect_mentions
from cartography_spark.sources.docs_synth import exploded_spans, interleaved_documents
from tests.conftest import SF_DIR

T1 = 111111111


@pytest.fixture(scope="module")
def docs(spark):
    return interleaved_documents(spark, SF_DIR).cache()


def test_span_offsets_strictly_increasing(spark, docs):
    """The per-row invariant: offset strictly increasing within each doc."""
    bad = docs.where(
        F.exists(
            F.zip_with(
                F.col("spans"),
                F.slice(F.col("spans"), 2, F.size("spans")),
                lambda a, b: b["offset"] <= a["offset"],
            ),
            lambda x: x,
        )
    )
    assert bad.count() == 0


def test_span_sequence_survives_explode_roundtrip(spark, docs):
    """(kind, text, media_ref, order) equality through posexplode +
    re-aggregation — the invariant must survive every shuffle."""
    spans = exploded_spans(docs)
    rebuilt = (
        spans.repartition(7, "kind")  # deliberately hostile shuffle
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("span_idx", "kind", "text", "media_ref", "offset"))
            ).alias("sorted_spans")
        )
        .select(
            "doc_id",
            F.transform(
                "sorted_spans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )
    a = rebuilt.select("doc_id", F.to_json("spans").alias("a_json"))
    b = docs.select("doc_id", F.to_json("spans").alias("b_json"))
    diff = a.join(b, "doc_id").where(F.col("a_json") != F.col("b_json"))
    assert diff.count() == 0
    assert rebuilt.count() == docs.count()


def test_mention_impls_agree(spark, docs):
    spans = exploded_spans(docs)
    native = detect_mentions(spans, "native")
    arrow = detect_mentions(spans, "arrow")
    assert native.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(native).count() == 0
    kinds = {r.mention_kind for r in native.select("mention_kind").distinct().collect()}
    assert kinds == {"arn", "email"}


def test_connected_components_basic(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("m", "m")], ["src", "dst"]
    )
    got = {(r.node, r.component) for r in connected_components(e).collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_connected_components_long_chain(spark):
    """A 64-node path graph — exercises the O(log n) star rounds."""
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(63)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    cc = connected_components(e)
    comps = cc.select("component").distinct().collect()
    assert len(comps) == 1 and comps[0].component == "n000"
    assert cc.count() == 64


def test_canonicalization_merges_iam_and_okta(spark, store):
    """An AWSUser and OktaUser sharing an email collapse to one canonical id."""
    rows = [
        ("arn:aws:iam::1:user/u1", "AWSUser", {"email": "a@x.com"}),
        ("okta-9", "OktaUser", {"login": "a@x.com"}),
        ("arn:aws:iam::1:user/u2", "AWSUser", {"email": "b@x.com"}),
    ]
    nodes = spark.createDataFrame(
        [(i, l, p, None, None, T1) for i, l, p in rows],
        "id string, label string, props map<string,string>, extra_labels array<string>, firstseen long, lastupdated long",
    )
    m = {r.node_id: r.canonical_id for r in canonical_mapping(nodes).collect()}
    assert m["okta-9"] == "arn:aws:iam::1:user/u1"
    assert m["arn:aws:iam::1:user/u1"] == "arn:aws:iam::1:user/u1"
    assert m["arn:aws:iam::1:user/u2"] == "arn:aws:iam::1:user/u2"
    # assume_forest skips the runtime bridge-check job; on forest-shaped
    # identity data (the provable call-site contract) it must be identical
    m_fast = {
        r.node_id: r.canonical_id
        for r in canonical_mapping(nodes, assume_forest=True).collect()
    }
    assert m_fast == m


def test_end_to_end_sync_triples(spark, store):
    """Flagship path at sf0.001: sync everything, check graph invariants."""
    from cartography_spark.kg.pipeline import run_sync

    res = run_sync(spark, store, SF_DIR, T1)
    assert res.node_count > 0 and res.edge_count > 0

    edges = store.edges()
    nodes = store.nodes()
    # Every doc yields 2 MENTIONS edges (canonical user entity + cluster).
    n_docs = nodes.where(F.col("label") == "Document").count()
    assert n_docs == 500
    assert edges.where(F.col("rel_label") == "MENTIONS").count() == 2 * n_docs

    # Referential integrity: no dangling edge endpoints.
    ids = nodes.select("id")
    dangling = (
        edges.join(ids.withColumnRenamed("id", "src_id"), "src_id", "left_anti").count()
        + edges.join(ids.withColumnRenamed("id", "dst_id"), "dst_id", "left_anti").count()
    )
    assert dangling == 0

    # MENTIONS canonical endpoints: okta duplicates must have been merged —
    # no MENTIONS edge may point at an OktaUser that shares an email with an
    # AWSUser (the AWSUser arn sorts first and wins representative).
    m_to_okta = edges.where(
        (F.col("rel_label") == "MENTIONS") & (F.col("dst_label") == "OktaUser")
    ).count()
    assert m_to_okta == 0
