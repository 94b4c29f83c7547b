"""Reproducible hash sampling: pure-function membership (stable
across partitionings), nested fractions, per-stratum control."""

import pytest
from pyspark.sql import functions as F

from kgpipe.operators.sample import (
    hash_sample,
    knuth_bucket,
    sample_bucket,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).select(F.col("id").alias("doc_id"))


def test_membership_is_stable_across_partitioning(spark, ids):
    b = sample_bucket(F.col("doc_id"))
    a = {r.doc_id for r in hash_sample(ids, b, 0.2).collect()}
    again = {
        r.doc_id
        for r in hash_sample(ids.repartition(17), sample_bucket(F.col("doc_id")), 0.2).collect()
    }
    assert a == again and 0 < len(a) < 5000


def test_fractions_are_nested(spark, ids):
    b = sample_bucket(F.col("doc_id"))
    s10 = {r.doc_id for r in hash_sample(ids, b, 0.10).collect()}
    s30 = {r.doc_id for r in hash_sample(ids, b, 0.30).collect()}
    assert s10 <= s30
    # roughly proportional (hash uniformity, generous bounds)
    assert 0.05 < len(s10) / 5000 < 0.15
    assert 0.24 < len(s30) / 5000 < 0.36


def test_seeds_give_independent_samples(spark, ids):
    a = {r.doc_id for r in hash_sample(ids, sample_bucket(F.col("doc_id"), 1), 0.2).collect()}
    b = {r.doc_id for r in hash_sample(ids, sample_bucket(F.col("doc_id"), 2), 0.2).collect()}
    assert a != b
    overlap = len(a & b) / max(len(a), 1)
    assert 0.1 < overlap < 0.35  # ~0.2 expected if independent


def test_knuth_bucket_matches_python(spark, ids):
    got = {r.doc_id: r.b for r in ids.select("doc_id", knuth_bucket(F.col("doc_id")).alias("b")).limit(100).collect()}
    for k, v in got.items():
        assert v == ((k & 0x7FFFFFFF) * 2654435761) % 1_000_000


def test_knuth_bucket_no_overflow_on_huge_keys(spark):
    """Keys beyond 2^31 must not overflow the 64-bit product (ANSI
    mode raises on overflow; non-ANSI silently wraps and diverges
    from the oracle — both are wrong)."""
    df = spark.createDataFrame(
        [(4_000_000_000,), (2**62,), (-5,)], "doc_id long"
    )
    got = {r.doc_id: r.b for r in df.select(
        "doc_id", knuth_bucket(F.col("doc_id")).alias("b")
    ).collect()}
    for k, v in got.items():
        assert v == ((k & 0x7FFFFFFF) * 2654435761) % 1_000_000


def test_stratified_fractions(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_hash_sample(
        df, sample_bucket(F.col("doc_id")), "lang", {"en": 0.1, "de": 0.5}
    )
    by_lang = {
        r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert 100 < by_lang["en"] < 320      # ~200 of 2000
    assert 800 < by_lang["de"] < 1200     # ~1000 of 2000
    # unlisted strata default to 0: nothing else leaks through
    assert set(by_lang) == {"en", "de"}


def test_fraction_validation():
    with pytest.raises(ValueError):
        hash_sample(None, None, 1.5)
    with pytest.raises(ValueError):
        stratified_hash_sample(None, None, "x", {"a": -0.1})
