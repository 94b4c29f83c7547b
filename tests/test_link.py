"""Near-duplicate URI linking (minhash LSH + verification) on the F5
fixture; plus the explicit owl:sameAs extractor."""

from pyspark.sql import functions as F

from kgpipe.fixtures import gen_neardup_uris
from kgpipe.operators.cc import canonical_map_for_nodes
from kgpipe.operators.link import (
    normalize_uri,
    sameas_edges_from_triples,
    verified_neardup_edges,
)


def test_normalize_uri(spark):
    df = spark.createDataFrame(
        [
            ("https://www.example.org/a/",),
            ("http://example.org/a",),
            ("http://example.org/b%20c",),
        ],
        ["uri"],
    )
    got = [r.n for r in df.select(normalize_uri(F.col("uri")).alias("n")).collect()]
    assert got == [
        "http://example.org/a",
        "http://example.org/a",
        "http://example.org/b c",
    ]


def test_neardup_clusters_match_golden(spark):
    """All five surface variants of each URI must land in one
    component; the edit-distance-2 negatives must stay singletons.
    This is the P/R=1.0 bar on the fixture."""
    fix = gen_neardup_uris()
    df = spark.createDataFrame(fix)
    edges = verified_neardup_edges(df, "uri")
    nodes = df.select(F.col("uri"))
    cmap = canonical_map_for_nodes(nodes, edges)
    got = {r.uri: r.canon_id for r in cmap.collect()}

    # same golden group → same canon; different group → different canon
    by_group = {}
    for _, row in fix.iterrows():
        by_group.setdefault(row.group_id, []).append(row.uri)
    for gid, uris in by_group.items():
        canons = {got[u] for u in uris}
        assert len(canons) == 1, f"group {gid} split: {canons}"
    canon_of_group = {gid: got[uris[0]] for gid, uris in by_group.items()}
    assert len(set(canon_of_group.values())) == len(canon_of_group), "groups merged"


def test_bucket_stats_counts_dropped(spark):
    from kgpipe.operators.link import bucket_stats

    banded = spark.createDataFrame(
        # bucket A: 5 ids; bucket B: singleton; bucket C: 2 ids
        [(i, 0, 100) for i in range(5)] + [(9, 0, 200)] + [(10, 0, 300), (11, 0, 300)],
        "id long, band int, bh long",
    )
    row = bucket_stats(banded, max_bucket=3).collect()[0]
    assert (row.n_buckets, row.n_singleton, row.n_dropped, row.ids_in_dropped,
            row.max_bucket_size) == (3, 1, 1, 5, 5)


def test_sameas_edges_from_triples(spark):
    triples = spark.createDataFrame(
        [
            ("a", "owl:sameAs", "b"),
            ("a", "rdf:type", "c"),
            ("b", "owl:sameAs", "a"),
        ],
        ["s", "p", "o"],
    )
    got = {
        (r.src, r.dst)
        for r in sameas_edges_from_triples(triples, "owl:sameAs").collect()
    }
    assert got == {("a", "b"), ("b", "a")}


def test_degenerate_bucket_dropped_before_reduce(spark):
    """Skew guard shape: a pathological bucket (here 20k identical
    texts → every band collides) must be removed by a broadcast
    anti-join BEFORE the final aggregation's exchange, so no reduce
    task ever streams it — and the healthy pairs still come through.
    Pinned both behaviorally and structurally (plan shows the
    LeftAnti broadcast join feeding the partial aggregate)."""
    from kgpipe.operators.link import banded_rows, capped_buckets, lsh_candidate_pairs, char_shingles, minhash_signature

    n_degen = 20_000
    degen = spark.range(n_degen).select(
        F.concat(F.lit("http://spam.example/page"), F.col("id").cast("string")).alias("uri"),
        F.lit("identical boilerplate text body").alias("norm"),
    )
    pair = spark.createDataFrame(
        [("http://a.example/x", "shared-near-dup-text-abcdefgh"),
         ("http://b.example/x", "shared-near-dup-text-abcdefgh")],
        ["uri", "norm"],
    )
    df = degen.union(pair)
    cands = lsh_candidate_pairs(df, "uri", "norm", max_bucket=64)
    got = {(r.a, r.b) for r in cands.collect()}
    assert ("http://a.example/x", "http://b.example/x") in got
    assert not any("spam.example" in a or "spam.example" in b for a, b in got)

    # structural pin: oversize keys are anti-joined out via broadcast
    # before the aggregation that materializes bucket state
    sig = minhash_signature(char_shingles(F.col("norm"), 4), 32, 42)
    banded = banded_rows(df, "uri", sig, 8, 4)
    plan = (
        capped_buckets(banded, 64, F.collect_list("uri").alias("ids"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in plan and "Broadcast" in plan, plan[:3000]
    assert "partial_count" in plan  # oversize scan reduces map-side
