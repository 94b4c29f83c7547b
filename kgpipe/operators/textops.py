"""Text analysis for training-data curation: language ID, quality
scoring, token counting, document fingerprinting.

Every function here is a pure column expression built from JVM-side
`pyspark.sql.functions` — whole-stage codegen, no UDFs, no shuffle.
Each has an exact ANSI-SQL twin in __spark_entry__.oracle_sql so the
driver's DuckDB gate verifies values, not just shapes. The semantics
are deliberately regex/arithmetic-only (no model weights) so they
are reproducible everywhere.

These generalize the reference's only text handling (whitespace
tokenization, common.go:42-43) to corpus-curation operators.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# marker stopwords per language, whole-word matched on lower(text);
# tie-break order is the CASE order in lang_id (en, de, es, fr)
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|in)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "es": r"\b(el|la|los|de|que|es)\b",
    "fr": r"\b(le|la|les|et|est|une)\b",
}

STOPWORD_REGEX = r"\b(the|and|of|to|a|in|is|it|that|for)\b"
PUNCT_REGEX = r"[.,;:!?]"


def token_count(text: Column) -> Column:
    """Number of BPE-ish pre-tokens (long)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)).cast("long")


def whitespace_token_count(text: Column) -> Column:
    """Reference-style whitespace tokens (strings.Fields semantics)."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def _count_matches(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1], rounded to 4dp:
       0.4 * stopword_ratio(cap 0.5)/0.5
     + 0.3 * (1 - punct_ratio*5 capped to [0,1])
     + 0.3 * min(n_ws_tokens, 100)/100
    Pure arithmetic over regex counts — identical in Spark and DuckDB.
    """
    n_tok = whitespace_token_count(text)
    stop = _count_matches(F.lower(text), STOPWORD_REGEX)
    punct = _count_matches(text, PUNCT_REGEX)
    n_chars = F.greatest(F.length(text), F.lit(1)).cast("double")
    stop_ratio = F.least(stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double"), F.lit(0.5)) / 0.5
    punct_pen = F.greatest(
        F.lit(0.0), F.lit(1.0) - (punct.cast("double") / n_chars) * 5.0
    )
    len_part = F.least(n_tok, F.lit(100)).cast("double") / 100.0
    return F.round(0.4 * stop_ratio + 0.3 * punct_pen + 0.3 * len_part, 4)


def lang_id(text: Column) -> Column:
    """Marker-word language ID over {en,de,es,fr}; 'und' when no
    markers hit. Ties resolved by fixed CASE order en,de,es,fr."""
    lower = F.lower(text)
    c = {k: _count_matches(lower, v) for k, v in LANG_MARKERS.items()}
    mx = F.greatest(*c.values())
    return (
        F.when(mx == 0, F.lit("und"))
        .when(c["en"] == mx, F.lit("en"))
        .when(c["de"] == mx, F.lit("de"))
        .when(c["es"] == mx, F.lit("es"))
        .otherwise(F.lit("fr"))
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of the
    whitespace-normalized, lowercased text. Exact-dedup key."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


def winnowing_fingerprint_rows(df, id_col: str, text_col: str, k: int = 8, w: int = 4):
    """Rolling-hash document fingerprints by winnowing (Schleimer,
    Wilkerson & Aiken, SIGMOD 2003 — the MOSS fingerprinter): hash
    every char k-gram of the normalized text, slide a w-window over
    the hash sequence, keep each window's minimum. Guarantee: any two
    documents sharing a substring of length ≥ k+w-1 share at least
    one fingerprint — the partial-overlap detector that exact md5
    (whole-doc) cannot provide. → (id, fp) rows, distinct per doc.

    Engine-portable by construction: the 'hash' is the md5 HEX STRING
    and window-min is lexicographic, so a DuckDB oracle reproduces it
    exactly. Plan shape: the k-gram hash array materializes in a
    Project directly under the Generate (posexplode), so it is
    evaluated once per row — never inlined into the per-window lambda
    (which would make it O(n²) per document, same trap as the LSH
    band hashes)."""
    from pyspark.sql import functions as F  # noqa: F811 (local alias)

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    n_grams = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.md5(norm.substr(i, F.lit(k)))
    )
    hashed = df.select(F.col(id_col), hashes.alias("__h"))
    n_win = F.greatest(F.size("__h") - (w - 1), F.lit(1))
    mins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda j: F.array_min(F.slice(F.col("__h"), j, w)),
        )
    )
    return hashed.select(id_col, F.explode(mins).alias("fp"))


def tfidf_top_terms(df, id_col: str, text_col: str, top_k: int = 3):
    """Per-document top-k terms by tf-idf → (doc_id, term, tfidf,
    rank). Plain whitespace tokens of lower(text); idf = ln(N/df)
    with df = documents containing the term. Two shuffles total:
    the (doc, term) count and the per-term document frequency — the
    df table joins back by term (broadcast when small, AQE decides).
    Deterministic: tfidf rounded to 6dp, ties broken by term asc.
    The standard relevance/keyword primitive for corpus triage."""
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.col(id_col)).distinct().count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def boilerplate_ngrams(
    df, id_col: str, text_col: str, k: int = 2, min_doc_frac: float = 0.05
):
    """Word k-grams present in ≥ min_doc_frac of documents → (gram,
    n_docs, doc_frac). The corpus-hygiene primitive for training
    data: navigation chrome, license footers and template headers
    show up as n-grams with anomalously high document frequency, and
    this table is what a cleaning pass filters against. One shuffle
    (groupBy gram over per-doc DISTINCT grams — map-side combine);
    the distinct-per-doc step reuses the dedup family's shingle
    machinery."""
    from kgpipe.operators.dedup import word_shingles

    n_docs = df.select(F.col(id_col)).distinct().count()
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("gram"),
    ).distinct()
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= float(min_doc_frac) * n_docs)
        .select(
            "gram",
            "n_docs",
            F.round(F.col("n_docs") / F.lit(float(n_docs)), 6).alias("doc_frac"),
        )
    )


def contamination_flags(
    docs,
    id_col: str,
    text_col: str,
    benchmark,
    bench_text_col: str = "text",
    k: int = 3,
    min_shared: int = 2,
):
    """Benchmark DECONTAMINATION — the training-data hygiene pass
    that keeps eval sets out of the corpus: flag every document
    sharing ≥ min_shared distinct word k-grams with ANY benchmark
    text. → (doc_id, n_shared), descending-filterable.

    Shape for 10^12 docs: the benchmark side is small by definition
    (eval suites are thousands of texts, not billions), so its
    distinct gram set BROADCASTS — the corpus side is one narrow
    explode + a map-side hash join + one groupBy(doc) count
    (partially aggregated). No corpus-side self-join, no shuffle of
    the gram space."""
    from pyspark.sql import functions as F

    from kgpipe.operators.dedup import word_shingles

    bg = (
        benchmark.select(
            F.explode(word_shingles(F.col(bench_text_col), k)).alias("gram")
        )
        .distinct()
    )
    dg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("gram"),
    ).distinct()
    return (
        dg.join(F.broadcast(bg), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
