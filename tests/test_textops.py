"""Text-analysis operators over the driver-provided documents table,
cross-checked against DuckDB running the oracle SQL — the same
comparison the driver's correctness gate performs."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kgpipe.operators.textops import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    whitespace_token_count,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_count_matches_duckdb(spark, docs, sf_dir):
    got = {
        r.doc_id: r.n_tok
        for r in docs.select("doc_id", token_count(F.col("text")).alias("n_tok")).collect()
    }
    exp = dict(
        duckdb.sql(
            f"""select doc_id, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
            from read_parquet('{sf_dir}/documents.parquet')"""
        ).fetchall()
    )
    assert got == exp


def test_fingerprint_matches_duckdb(spark, docs, sf_dir):
    got = {
        r.doc_id: r.fp
        for r in docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()
    }
    exp = dict(
        duckdb.sql(
            f"""select doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
            from read_parquet('{sf_dir}/documents.parquet')"""
        ).fetchall()
    )
    assert got == exp


def test_quality_score_range_and_determinism(spark, docs):
    rows = docs.select(quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)
    rows2 = docs.repartition(5).select(quality_score(F.col("text")).alias("q")).collect()
    assert sorted(r.q for r in rows) == sorted(r.q for r in rows2)


def test_lang_id_basic(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house",),
            ("der hund und die katze ist nicht da",),
            ("el perro y la casa de los gatos es",),
            ("le chien et la maison est une belle",),
            ("xyzzy plugh 12345",),
        ],
        ["text"],
    )
    got = [r.l for r in df.select(lang_id(F.col("text")).alias("l")).collect()]
    assert got == ["en", "de", "es", "fr", "und"]


def test_whitespace_token_count(spark):
    df = spark.createDataFrame([("a  b\tc",), ("one",)], ["text"])
    got = [r.n for r in df.select(whitespace_token_count(F.col("text")).alias("n")).collect()]
    assert got == [3, 1]


def test_winnowing_overlap_guarantee(spark):
    """Winnowing guarantee: substrings of length >= k+w-1 shared by
    two documents always share a fingerprint (k=8, w=4 -> 11)."""
    from kgpipe.operators.textops import winnowing_fingerprint_rows

    shared = "this exact run of words appears in both documents verbatim"
    df = spark.createDataFrame(
        [
            (1, "prefix one. " + shared + " suffix alpha"),
            (2, "totally different lead-in text " + shared),
            (3, "no overlap with the others at all, entirely disjoint words"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprint_rows(df, "doc_id", "text").collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    # distinct fingerprints per doc (array_distinct applied)
    assert len(by_doc[1]) == len({f for f in by_doc[1]})


def test_winnowing_position_count_bound(spark):
    """Every w-window contributes a fingerprint, so a doc of n grams
    yields between ceil(n/w) and n distinct fingerprints at most."""
    from kgpipe.operators.textops import winnowing_fingerprint_rows

    text = "abcdefghijklmnopqrstuvwxyz" * 4
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n = len(text) - 7
    got = winnowing_fingerprint_rows(df, "doc_id", "text", k=8, w=4).count()
    assert 1 <= got <= n


def test_tfidf_top_terms_semantics(spark):
    from kgpipe.operators.textops import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry cherry common"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, "doc_id", "text", top_k=2).collect()
    top1 = {r.doc_id: r.term for r in rows if r.rank == 1}
    # 'common' is in every doc → idf 0 → never the top term
    assert top1 == {1: "apple", 2: "banana", 3: "cherry"}
    assert all(r.tfidf == 0 for r in rows if r.term == "common")


def test_boilerplate_ngrams_threshold(spark):
    from kgpipe.operators.textops import boilerplate_ngrams

    footer = "all rights reserved"
    docs = spark.createDataFrame(
        [(i, f"unique{i} words here {footer}") for i in range(20)]
        + [(100, "totally different text")],
        "doc_id long, text string",
    )
    got = {r.gram: r.n_docs for r in boilerplate_ngrams(
        docs, "doc_id", "text", k=3, min_doc_frac=0.5
    ).collect()}
    assert got.get("all rights reserved") == 20
    assert not any(g.startswith("unique") for g in got)


def test_contamination_flags(spark):
    from kgpipe.operators.textops import contamination_flags

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "totally unrelated content about spark pipelines"),
            (2, "he saw the quick brown fox jumps away"),   # shares 3-grams
            (3, "quick brown dogs are not foxes"),           # shares none (3-gram)
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_shared for r in contamination_flags(
        docs, "doc_id", "text", bench, "text", k=3, min_shared=2
    ).collect()}
    assert set(got) == {2}
    assert got[2] >= 2  # 'the quick brown', 'quick brown fox', 'brown fox jumps'
