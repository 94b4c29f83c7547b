"""Skew handling for Zipfian keys (hot rdf:type / owl:sameAs
predicates — SURVEY.md §7 M7).

What Spark already gives us (kgpipe.session enables it):
  - map-side partial aggregation for algebraic aggs (count/sum/min):
    a hot groupBy key combines within every task before the shuffle,
    so plain groupBy().count() is NOT the skew problem;
  - AQE skew-join splitting for sort-merge joins.

What still skews and is handled here:
  - aggregation state that grows with the group (collect_list/
    count_distinct): one reducer ends up holding the hot key's whole
    population → two-phase SALTED aggregation, salt derived from the
    VALUE so per-salt populations are disjoint and exact;
  - joins against a replicated-dimension pattern where AQE can't
    help (broadcast-too-big, shuffle-hash): explicit salt-replicate
    join.

Every helper is exact (same result as the unsalted form), verified
by tests against the direct computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_distinct_count(
    df: DataFrame, key_cols: list[str], value_col: str, n_salt: int = 32
) -> DataFrame:
    """Exact count(distinct value) per key, skew-safe.

    Phase 1 groups on (key, salt(value)): because the salt is a pure
    function of the value, each distinct value is counted in exactly
    one salt bucket — the per-reducer state is |distinct|/n_salt.
    Phase 2 sums the disjoint partial counts. → key_cols + n_distinct.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salt))
    phase1 = (
        df.groupBy(*key_cols, salt.alias("__salt"))
        .agg(F.count_distinct(F.col(value_col)).alias("__pc"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("__pc").alias("n_distinct"))


def salted_collect_sample(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    per_key_limit: int = 100,
    n_salt: int = 32,
) -> DataFrame:
    """Bounded collect_list per key without a hot reducer: each salt
    bucket keeps its per_key_limit smallest values (enough for the
    worst case where all global minima hash into one bucket — this
    is what makes the result EXACTLY equal the unsalted
    slice(sort(collect_list), 1, limit)), phase 2 flattens, re-sorts
    and truncates. Reducer state is ≤ per_key_limit values per
    (key, salt) instead of the key's whole population.
    → key_cols + sample (array)."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salt))
    phase1 = (
        df.groupBy(*key_cols, salt.alias("__salt"))
        .agg(F.slice(F.sort_array(F.collect_list(F.col(value_col))), 1, per_key_limit).alias("__vs"))
    )
    return phase1.groupBy(*key_cols).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("__vs"))), 1, per_key_limit).alias("sample")
    )


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: the big side salts each row by a hash of
    the whole row (uniform), the dim side replicates n_salt times, and
    the join key becomes (key, salt) — a hot key's rows spread over
    n_salt reducers. Use when the dim side is too big to broadcast
    and AQE's skew splitting is unavailable (e.g. shuffle-hash)."""
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    )
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    return big_salted.join(dim_rep, [key, "__salt"]).drop("__salt")


def partition_row_counts(df: DataFrame) -> DataFrame:
    """(spark_partition_id, n_rows) — the observability hook for
    'no task holds more than K× the median input' assertions."""
    return df.groupBy(F.spark_partition_id().alias("pid")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
