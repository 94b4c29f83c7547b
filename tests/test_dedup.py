"""Dedup family: exact, minhash-LSH, simhash, n-gram Jaccard."""

import pytest
from pyspark.sql import functions as F

from kgpipe.operators.dedup import (
    distinct_documents,
    exact_duplicates,
    minhash_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the afternoon sun near the garden"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 10 unique docs
    for i in range(10):
        rows.append((i, f"document number {i} " + BASE + f" unique suffix {i} " * 3))
    # exact dups of doc 0 and 1 (differing only in case/whitespace)
    rows.append((100, rows[0][1].upper()))
    rows.append((101, "  " + rows[1][1].replace(" ", "  ") + "  "))
    # near-dup of doc 2: one word changed
    rows.append((102, rows[2][1].replace("windowsill", "floor")))
    # unrelated doc
    rows.append((103, "completely different content about spark engines and parquet files " * 4))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(spark, corpus):
    dups = exact_duplicates(corpus, "doc_id", "text")
    got = {(r.id, r.keep_id) for r in dups.collect()}
    assert got == {(0, 0), (100, 0), (1, 1), (101, 1)}


def test_distinct_documents(spark, corpus):
    kept = {r.doc_id for r in distinct_documents(corpus, "doc_id", "text").collect()}
    assert 100 not in kept and 101 not in kept
    assert {0, 1, 2, 102, 103} <= kept


def test_minhash_finds_neardup(spark, corpus):
    pairs = {(r.a, r.b) for r in minhash_dup_pairs(corpus, "doc_id", "text", jaccard_threshold=0.7).collect()}
    assert (2, 102) in pairs
    assert not any(103 in p for p in pairs), "unrelated doc matched"


def test_minhash_agrees_with_exact_jaccard(spark, corpus):
    """LSH+verify must return exactly the exact-Jaccard pairs at the
    same threshold when bands are generous (recall ≈ 1 here)."""
    got = {(r.a, r.b) for r in minhash_dup_pairs(
        corpus, "doc_id", "text", num_hashes=128, bands=64, jaccard_threshold=0.7
    ).collect()}
    exp = {(r.a, r.b) for r in ngram_jaccard_pairs(
        corpus, "doc_id", "text", k=3, threshold=0.7
    ).collect()}
    assert got == exp


def test_simhash_near_pairs(spark, corpus):
    # radius 10 needs ≥11 bands for guaranteed recall → 16 bands here
    pairs = {(r.a, r.b) for r in simhash_near_pairs(
        corpus, "doc_id", "text", max_hamming=10, n_bands=16
    ).collect()}
    assert (2, 102) in pairs
    assert not any(103 in p for p in pairs)


def test_simhash_rejects_unguaranteed_radius(spark, corpus):
    # 4 bands only pigeonhole hamming ≤ 3; wider radii would silently
    # miss pairs, so the operator must refuse instead
    with pytest.raises(ValueError, match="guarantees recall"):
        simhash_near_pairs(corpus, "doc_id", "text", max_hamming=16, n_bands=4)


def test_degenerate_bucket_capped(spark):
    """One pathological bucket (20k identical docs → identical
    signatures → every band collides) must be dropped by the cap
    BEFORE materialization — the run completes with bounded reducer
    state and the rest of the output is unchanged."""
    n = 20_000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("all work and no play makes jack a dull boy").alias("text"),
    )
    extra = spark.createDataFrame(
        [(n + 1, BASE), (n + 2, BASE + " extra tail words here")],
        "doc_id long, text string",
    )
    got = {
        (r.a, r.b)
        for r in minhash_dup_pairs(
            base.union(extra), "doc_id", "text",
            num_hashes=64, bands=16, jaccard_threshold=0.5, max_bucket=64,
        ).collect()
    }
    assert got == {(n + 1, n + 2)}


def test_ngram_jaccard_threshold(spark, corpus):
    rows = ngram_jaccard_pairs(corpus, "doc_id", "text", k=3, threshold=0.9).collect()
    for r in rows:
        assert r.jaccard >= 0.9


def test_simhash_matches_bruteforce_hamming_on_real_text(spark):
    """Brute-force hamming twin over REAL corpus text (the r5 verdict's
    promotion move): the banded/capped simhash operator must return
    exactly the cross-join hamming ≤ 3 pair set — including the
    nonzero-hamming pairs the driver's planted-corpus oracle cannot
    plant. Pigeonhole banding guarantees recall at this radius, and
    the exact hamming filter guarantees precision, so equality is
    exact, not approximate."""
    from kgpipe.operators.dedup import simhash64

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        (r.a, r.b, r.hamming)
        for r in simhash_near_pairs(
            docs, "doc_id", "text", max_hamming=3, shingle_k=2
        ).collect()
    }
    h = docs.select(F.col("doc_id").alias("id"), simhash64(F.col("text"), 2).alias("h"))
    l = h.select(F.col("id").alias("a"), F.col("h").alias("ha"))
    r_ = h.select(F.col("id").alias("b"), F.col("h").alias("hb"))
    brute = (
        l.crossJoin(r_)
        .where(F.col("a") < F.col("b"))
        .select(
            "a", "b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming")
        )
        .where(F.col("hamming") <= 3)
    )
    exp = {(r.a, r.b, r.hamming) for r in brute.collect()}
    assert got == exp and len(exp) > 0
