"""M7 skew hardening: salted two-phase aggregation is exact on a
Zipf-hot key set, and spreads the hot key's state across reducers."""

import pytest
from pyspark.sql import functions as F

from kgpipe.fixtures import RDF_TYPE, gen_pages
from kgpipe.operators.skew import (
    partition_row_counts,
    salted_collect_sample,
    salted_distinct_count,
    salted_join,
)


@pytest.fixture(scope="module")
def zipf_triples(spark):
    """Triples with a ~40% hot predicate (fixture generator's Zipf
    mix), parsed through the real chain."""
    from kgpipe.fixtures import RULES_16_TEXT
    from kgpipe.operators.extract import with_extracted_text
    from kgpipe.operators.parse import parse_pages_to_triples

    pages = spark.createDataFrame(gen_pages(300))
    t = parse_pages_to_triples(with_extracted_text(pages)).where(F.col("s").isNotNull())
    return t.persist()


def test_hot_key_exists(zipf_triples):
    counts = {r.p: r.n for r in zipf_triples.groupBy("p").agg(F.count("*").alias("n")).collect()}
    hot = counts.get(RDF_TYPE, 0)
    assert hot / sum(counts.values()) > 0.25, "fixture lost its Zipf skew"


def test_salted_distinct_count_exact(zipf_triples):
    got = {
        (r.p,): r.n_distinct
        for r in salted_distinct_count(zipf_triples, ["p"], "s", n_salt=8).collect()
    }
    exp = {
        (r.p,): r.nd
        for r in zipf_triples.groupBy("p").agg(F.count_distinct("s").alias("nd")).collect()
    }
    assert got == exp


def test_salted_phase1_bounds_group_size(spark, zipf_triples):
    """Phase-1 groups on (p, salt(s)) must each be ~1/n_salt of the
    hot key's population — no reducer holds the whole hot key."""
    n_salt = 8
    hot_total = zipf_triples.where(F.col("p") == RDF_TYPE).count()
    sizes = (
        zipf_triples.where(F.col("p") == RDF_TYPE)
        .groupBy(F.pmod(F.xxhash64("s"), F.lit(n_salt)).alias("salt"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(sizes) == n_salt
    assert max(r.n for r in sizes) <= (hot_total / n_salt) * 2.5


def test_salted_collect_sample_bounded(zipf_triples):
    rows = salted_collect_sample(zipf_triples, ["p"], "s", per_key_limit=50, n_salt=8).collect()
    assert all(len(r.sample) <= 50 for r in rows)
    assert any(len(r.sample) == 50 for r in rows)  # hot key hits the cap


def test_salted_collect_sample_exact(zipf_triples):
    """EXACT equality with the unsalted form: each salt bucket keeps
    its per_key_limit smallest, so the merged truncation equals
    slice(sort(collect_list), 1, limit) even when all global minima
    hash into one bucket."""
    got = {
        r.p: list(r.sample)
        for r in salted_collect_sample(
            zipf_triples, ["p"], "s", per_key_limit=25, n_salt=8
        ).collect()
    }
    unsalted = (
        zipf_triples.groupBy("p")
        .agg(F.slice(F.sort_array(F.collect_list("s")), 1, 25).alias("sample"))
        .collect()
    )
    exp = {r.p: list(r.sample) for r in unsalted}
    assert got == exp


def test_salted_join_matches_plain_join(spark, zipf_triples):
    dim = zipf_triples.select("p").distinct().withColumn("p_meta", F.concat(F.lit("m:"), "p"))
    plain = zipf_triples.join(dim, "p").groupBy("p_meta").count()
    salted = salted_join(zipf_triples, dim, "p", n_salt=4).groupBy("p_meta").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_partition_row_counts(spark, zipf_triples):
    balanced = zipf_triples.repartition(8, "s")  # subjects are high-cardinality
    rows = partition_row_counts(balanced).collect()
    total = sum(r.n_rows for r in rows)
    assert total == zipf_triples.count()
    med = sorted(r.n_rows for r in rows)[len(rows) // 2]
    assert max(r.n_rows for r in rows) <= 4 * max(med, 1), "task skew > 4x median"
