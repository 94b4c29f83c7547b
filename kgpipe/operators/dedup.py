"""Document deduplication family for training-data pipelines:

  exact            — md5 fingerprint groupBy (one shuffle, map-side
                     combine on min-id representative)
  minhash + LSH    — word-shingle minhash (codegen'd fold, no UDF),
                     banded bucket join, exact-Jaccard verification
  simhash          — 64-bit simhash via a per-row fold; near-dup by
                     banded hamming blocking
  n-gram Jaccard   — exact pairwise Jaccard via shared-gram counting
                     (the verification primitive; also usable alone
                     at small scale / as an oracle)

Scale notes: every operator's only shuffles are groupBys on
content-derived keys. Pair generation is bounded by bucket caps (LSH)
/ band blocking (simhash); nothing materializes the O(n²) pair space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kgpipe.operators.link import (
    _pairs_from_sorted_array,
    banded_rows,
    capped_buckets,
    minhash_signature,
)
from kgpipe.operators.textops import doc_fingerprint


# --- exact -----------------------------------------------------------
def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id, keep_id, fingerprint) for every duplicated row; keep_id
    is the min id of the identical-content group."""
    fp = df.select(F.col(id_col).alias("id"), doc_fingerprint(F.col(text_col)).alias("fingerprint"))
    groups = fp.groupBy("fingerprint").agg(
        F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n")
    )
    return (
        fp.join(groups.where(F.col("n") > 1), "fingerprint")
        .select("id", "keep_id", "fingerprint")
    )


def distinct_documents(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per distinct normalized content (the min id) —
    the dedup 'apply' step."""
    fp = df.withColumn("__fp", doc_fingerprint(F.col(text_col)))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


# --- shingles ---------------------------------------------------------
def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams of lower(text), JVM-side."""
    words = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return F.array_distinct(grams)


# --- minhash LSH -------------------------------------------------------
def minhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 256,
) -> DataFrame:
    """→ (a, b, jaccard) near-duplicate pairs, a < b, verified by
    exact shingle Jaccard ≥ threshold.

    max_bucket=256 (was 128): measured on the sf0.1 documents corpus
    (tools/minhash_recall_probe.py + minhash_miss_attribution). Under
    the v1 correlated hash family the 128 cap dropped buckets holding
    15 of 256 ground-truth pairs (recall 0.914) because correlated
    signatures concentrated rows into few over-cap buckets; the v2
    independent family (see minhash_signature) spreads membership and
    measures recall 1.0 even at 128. 256 is kept as headroom for the
    same concentration arising from DATA (boilerplate shingle sets)
    rather than the hash family — it still bounds the per-bucket pair
    expansion to 256²/2, and the skew guard targets degenerate
    buckets, which sit orders above any real near-dup cluster."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # verification compares shingle SETS; hashing each gram to a long
    # first makes the array_intersect/union per candidate pair ~10×
    # cheaper than string comparisons, with identical Jaccard (a
    # 64-bit collision within one doc's ~10²-gram set is ~2⁻⁵⁰)
    sh = F.array_distinct(
        F.transform(word_shingles(F.col(text_col), shingle_k), lambda g: F.xxhash64(g))
    )
    # EAGER: the (id, hashed-shingles) base is consumed three ways
    # (signature fold → bands, and both sides of the verification
    # join); checkpointing it once stops the shingle derivation from
    # recomputing per consumer, and banded_rows(materialize=True)
    # pins the signature fold so the two-phase skew guard pays it
    # once (see banded_rows docstring for why not persist()).
    base = df.select(F.col(id_col).alias("id"), sh.alias("sh")).localCheckpoint(
        eager=True
    )
    sig = minhash_signature(F.col("sh"), num_hashes)
    banded = banded_rows(base, "id", sig, bands, r, materialize=True)
    buckets = capped_buckets(banded, max_bucket, F.collect_list("id").alias("ids"))
    ids = F.array_sort(F.array_distinct(F.col("ids")))
    cand = (
        buckets.select(F.explode(_pairs_from_sorted_array(ids)).alias("pr"))
        .select("pr.a", "pr.b")
        .distinct()
    )
    sa = base.select(F.col("id").alias("a"), F.col("sh").alias("sh_a"))
    sb = base.select(F.col("id").alias("b"), F.col("sh").alias("sh_b"))
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b"))
    ).alias("jaccard")
    return (
        cand.join(sa, "a").join(sb, "b")
        .select("a", "b", jac)
        .where(F.col("jaccard") >= jaccard_threshold)
    )


# --- simhash ------------------------------------------------------------
# bit masks as literals: shiftleft/shiftright take only int shift
# amounts, so per-bit work uses a constant mask array instead (bit 63
# is the sign bit of a signed long)
_BIT_MASKS = [1 << i for i in range(63)] + [-(1 << 63)]


def simhash64(text: Column, shingle_k: int = 2) -> Column:
    """64-bit simhash of word k-grams as a codegen'd fold: accumulate
    per-bit counters (±1 per gram bit), then pack the sign vector
    into a long by xor-ing the masks of non-negative counters."""
    grams = word_shingles(text, shingle_k)
    init = F.array_repeat(F.lit(0).cast("long"), 64)

    def signs(g: Column) -> Column:
        h = F.xxhash64(g)
        return F.array(*[
            F.when(h.bitwiseAND(F.lit(m).cast("long")) != 0, F.lit(1).cast("long"))
            .otherwise(F.lit(-1).cast("long"))
            for m in _BIT_MASKS
        ])

    counters = F.aggregate(grams, init, lambda acc, g: F.zip_with(acc, signs(g), lambda a, b: a + b))
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    packed = F.zip_with(
        counters, masks, lambda c, m: F.when(c >= 0, m).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(packed, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseXOR(x))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    shingle_k: int = 2,
    max_bucket: int = 256,
    n_bands: int = 4,
) -> DataFrame:
    """→ (a, b, hamming) pairs with hamming(simhash) ≤ max_hamming.

    Blocking: split the 64-bit hash into n_bands equal bands — a pair
    within hamming ≤ n_bands-1 has at least one band with zero
    differing bits (pigeonhole), so it shares an exact band bucket.
    max_hamming > n_bands-1 would silently MISS pairs whose diffs
    spread over every band, so it raises instead: widen n_bands (at
    the cost of bigger buckets — band width 64/n_bands halves per
    doubling, so buckets grow ~quadratically) or lower the radius."""
    if not (n_bands > 0 and 64 % n_bands == 0):
        raise ValueError(f"n_bands must divide 64, got {n_bands}")
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"banded blocking with {n_bands} bands only guarantees recall for "
            f"hamming <= {n_bands - 1}; got max_hamming={max_hamming}. "
            "Raise n_bands or lower max_hamming."
        )
    width = 64 // n_bands
    mask = (1 << width) - 1
    # EAGER: the simhash fold (64 per-bit masks per gram — the
    # heaviest signature derivation in the family) feeds the banded
    # rows, which capped_buckets traverses twice; the (id, h) base is
    # ONE long per row, so checkpointing it costs ~nothing and halves
    # the operator (measured: the unmaterialized form doubled in the
    # r3 bench when the two-phase skew guard landed).
    base = df.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col), shingle_k).alias("h")
    ).localCheckpoint(eager=True)
    banded = base.select(
        "id",
        "h",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("h"), j * width).bitwiseAND(F.lit(mask))
                for j in range(n_bands)
            ])
        ).alias("band", "bh"),
    )
    buckets = capped_buckets(
        banded, max_bucket, F.collect_list(F.struct("id", "h")).alias("xs")
    )
    xs = F.array_sort(F.array_distinct(F.col("xs")))
    pairs = (
        buckets.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            xs,
                            lambda a: F.transform(
                                xs, lambda b: F.struct(a.alias("x"), b.alias("y"))
                            ),
                        )
                    ),
                    lambda st: st["x"]["id"] < st["y"]["id"],
                )
            ).alias("pr")
        )
        .select(
            F.col("pr.x.id").alias("a"),
            F.col("pr.y.id").alias("b"),
            F.bit_count(F.col("pr.x.h").bitwiseXOR(F.col("pr.y.h"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


# --- exact n-gram Jaccard (brute via shared-gram counting) ---------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """→ (a, b, jaccard) for all pairs sharing ≥1 gram with
    J ≥ threshold. Explode grams → self-join on gram → count shared →
    J = c/(|A|+|B|-c). The join is on the gram key, so cost is
    Σ bucket² over gram frequencies — fine when shingles are
    discriminative; this is the exact/oracle path, LSH is the scale
    path."""
    grams = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), k)).alias("g")
    ).distinct()
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    ga = grams.select(F.col("id").alias("a"), "g")
    gb = grams.select(F.col("id").alias("b"), "g")
    shared = (
        ga.join(gb, "g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    return (
        shared.join(na, "a").join(nb, "b")
        .select(
            "a",
            "b",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# --- recall attribution ------------------------------------------------
def minhash_miss_attribution(
    df: DataFrame,
    id_col: str,
    text_col: str,
    missed: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 128,
) -> DataFrame:
    """Attribute each missed near-dup pair (a ground-truth pair the
    LSH query failed to emit) to its cause → (a, b, cause) with cause
    ∈ {'cap_dropped', 'banding_miss'}:

      cap_dropped  — the pair DID share ≥1 LSH bucket, but every
                     shared bucket exceeded max_bucket and was dropped
                     by capped_buckets' skew guard. Tunable: raise
                     max_bucket / re-shingle.
      banding_miss — the pair never collided in any band: the
                     irreducible probabilistic miss of the banding
                     scheme, bounded by (1 - J^r)^b. Tunable only by
                     changing the family (more hashes / wider bands).

    Rebuilds the banded rows under the SAME family parameters as
    minhash_dup_pairs and classifies via two joins on (band, bh) —
    one against the pair's two sides, one against the bucket-size
    table. `missed` is expected to be small (it is the recall gap);
    the pair-side joins stay narrow because banded rows are joined to
    it, not to themselves. This is the measurement behind the r6
    verdict directive: "the JSON says how many missed pairs died in
    dropped buckets vs banding" (bench.bench_recalls)."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sh = F.array_distinct(
        F.transform(word_shingles(F.col(text_col), shingle_k), lambda g: F.xxhash64(g))
    )
    base = df.select(F.col(id_col).alias("id"), sh.alias("sh"))
    sig = minhash_signature(F.col("sh"), num_hashes)
    banded = banded_rows(base, "id", sig, bands, r, materialize=True)
    sizes = banded.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("__sz"))
    ba = banded.select(F.col("id").alias("a"), "band", "bh")
    bb = banded.select(F.col("id").alias("b"), "band", "bh")
    shared = missed.join(ba, "a").join(bb, ["b", "band", "bh"])
    verdict = (
        shared.join(sizes, ["band", "bh"])
        .groupBy("a", "b")
        .agg(F.min("__sz").alias("min_sz"))
        .select(
            "a",
            "b",
            F.when(F.col("min_sz") <= max_bucket, F.lit("anomaly"))
            .otherwise(F.lit("cap_dropped"))
            .alias("cause"),
        )
    )
    # pairs sharing no bucket at all never appear in `shared`
    no_bucket = missed.join(verdict.select("a", "b"), ["a", "b"], "left_anti").select(
        "a", "b", F.lit("banding_miss").alias("cause")
    )
    return verdict.unionByName(no_bucket)
