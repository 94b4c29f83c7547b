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
    # ONE eager checkpoint holding (id, hashed-shingles, signature):
    # the base is consumed three ways (bands, and both sides of the
    # verification join) and the banded rows twice (capped_buckets'
    # two-phase skew guard) — materializing shingles AND the signature
    # fold together costs one job where the previous shape paid two
    # (a base checkpoint, then banded_rows(materialize=True)'s second
    # checkpoint re-reading it just to pin the signature). The two
    # stacked selects keep the shingle derivation out of the signature
    # expression (CollapseProject leaves a non-cheap alias referenced
    # twice alone), so shingles are still evaluated once per row.
    base = (
        df.select(F.col(id_col).alias("id"), sh.alias("sh"))
        .select("id", "sh", minhash_signature(F.col("sh"), num_hashes).alias("__sig"))
        .localCheckpoint(eager=True)
    )
    banded = banded_rows(base, "id", F.col("__sig"), bands, r)
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
    """64-bit simhash of word k-grams, value-identical to the classic
    ±1-counter formulation but restructured for evaluation cost (r8):

      * each gram is hashed ONCE into an array bound to a lambda
        variable — the previous per-gram signs() referenced the
        xxhash64(gram) subtree from all 64 bit tests, and HOF lambdas
        re-evaluate referenced subtrees per element, so every gram
        paid 64 string hashes;
      * the per-bit ±1 counter c_i = 2·(set-bit count) − n, so the
        sign test c_i ≥ 0 is exactly 2·cnt_i ≥ n over an integer
        popcount per bit — no per-gram 64-wide arrays, no zip_with
        accumulator allocation per gram;
      * the single-element transform(array(x), …) wrappers are let-
        bindings: they evaluate the hash array (and its size) once
        per row and expose them as O(1) lambda variables.

    Bit membership ((h >> i) & 1, arithmetic shift for the sign bit)
    matches the old mask test for every i incl. 63; the xor-pack
    accumulates the same masks in the same order; null text still
    yields a null hash. Pinned equal to the previous implementation
    bit-for-bit (tests/test_dedup.py brute twin + oracle gate)."""
    grams = word_shingles(text, shingle_k)
    hs = F.transform(grams, lambda g: F.xxhash64(g))

    def pack(h_arr: Column, n: Column) -> Column:
        one = F.lit(1).cast("long")

        def popbit(i: int):
            # factory, not a default-arg lambda: pyspark's HOF wrapper
            # inspects the lambda arity and rejects extra parameters
            return lambda acc, h: acc + F.shiftright(h, i).bitwiseAND(one)

        expr = F.lit(0).cast("long")
        for i, m in enumerate(_BIT_MASKS):
            cnt = F.aggregate(h_arr, F.lit(0).cast("long"), popbit(i))
            expr = expr.bitwiseXOR(
                F.when(cnt * 2 >= n, F.lit(m).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            )
        return expr

    return F.element_at(
        F.transform(
            F.array(hs),
            lambda h_arr: F.element_at(
                F.transform(
                    F.array(F.size(h_arr)),
                    lambda n: F.when(
                        h_arr.isNotNull(), pack(h_arr, n)
                    ).otherwise(F.lit(None).cast("long")),
                ),
                1,
            ),
        ),
        1,
    )


# Expression-tree memo (EXPRESSIONS only — never data or results):
# the simhash column is ~70 nested higher-order functions whose
# CONSTRUCTION costs ~1s of py4j round-trips, re-paid on every query
# build (bench repetitions rebuild each plan). The tree depends only
# on shingle_k once the input is pinned to a fixed column name, so
# build it once per process against `__simhash_in` and let callers
# substitute their text column with an alias-select (the alias is an
# attribute → CollapseProject folds the extra Project away).
_SIMHASH_IN = "__simhash_in"
_SIMHASH_EXPR_CACHE: dict[int, Column] = {}


def _simhash64_on_input_col(shingle_k: int) -> Column:
    c = _SIMHASH_EXPR_CACHE.get(shingle_k)
    if c is None:
        c = simhash64(F.col(_SIMHASH_IN), shingle_k)
        _SIMHASH_EXPR_CACHE[shingle_k] = c
    return c


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
    # EAGER: the simhash fold (the heaviest signature derivation in
    # the family) feeds the banded rows, which capped_buckets
    # traverses twice; the (id, h) base is ONE long per row, so
    # checkpointing it costs ~nothing and halves the operator
    # (measured: the unmaterialized form doubled in the r3 bench when
    # the two-phase skew guard landed). The hash expression comes from
    # the per-process memo via an alias-select (same plan after
    # CollapseProject; ~1s of per-call py4j construction saved).
    base = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias(_SIMHASH_IN))
        .select("id", _simhash64_on_input_col(shingle_k).alias("h"))
        .localCheckpoint(eager=True)
    )
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
    ∈ {'cap_dropped', 'banding_miss', 'anomaly'}:

      cap_dropped  — the pair DID share ≥1 LSH bucket, but every
                     shared bucket exceeded max_bucket and was dropped
                     by capped_buckets' skew guard. Tunable: raise
                     max_bucket / re-shingle.
      banding_miss — the pair never collided in any band: the
                     irreducible probabilistic miss of the banding
                     scheme, bounded by (1 - J^r)^b. Tunable only by
                     changing the family (more hashes / wider bands).
      anomaly      — the pair shared an UNDER-cap bucket yet was still
                     missed: a pair that should have been emitted,
                     i.e. a bug signal in the candidate/verification
                     path, not a tuning issue. Callers keying on the
                     cause set must not drop it silently (ADVICE r7).

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
