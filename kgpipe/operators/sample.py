"""Reproducible corpus sampling — the holdout/split primitive a
training-data pipeline needs.

`df.sample()` is a per-run coin flip: membership changes with
partitioning, retries, and reprocessing. These operators make
membership a PURE FUNCTION of a key, so the same rows stay sampled
when the corpus is re-read, appended to, or processed on a different
cluster — which is what keeps a holdout set honest across pipeline
runs. Everything is a narrow filter (no shuffle, no RNG state); at
100 TB a sample is a predicate pushed at the scan, not a pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SAMPLE_BUCKETS = 1_000_000


def sample_bucket(key: Column, seed: int = 1) -> Column:
    """Uniform bucket in [0, SAMPLE_BUCKETS) from a key column —
    xxhash64-based (JVM-side). Change `seed` to draw an independent
    sample from the same corpus."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(SAMPLE_BUCKETS))


def knuth_bucket(key: Column) -> Column:
    """Engine-portable bucket: Knuth multiplicative mix over the LOW
    31 BITS of an integer key — exact in any engine with 64-bit
    integers (the DuckDB oracle computes the identical expression),
    unlike xxhash64 which only Spark has. The 31-bit fold keeps the
    product ≤ 2^31·2654435761 < 2^63, so it can never overflow a
    signed long (an unmasked key ≥ ~3.47e9 raises under Spark 4's
    default ANSI mode and silently wraps — diverging from the
    oracle — with ANSI off; operators here must be overflow-free
    under ANY session conf). Weaker mixing than xxhash64; use for
    cross-engine-reproducible splits over integer keys."""
    folded = key.cast("long").bitwiseAND(F.lit((1 << 31) - 1).cast("long"))
    return F.pmod(folded * F.lit(2654435761), F.lit(SAMPLE_BUCKETS))


def hash_sample(
    df: DataFrame, bucket: Column, fraction: float
) -> DataFrame:
    """Keep rows whose bucket falls in the first `fraction` of the
    bucket space. Samples drawn at fractions f1 < f2 are NESTED
    (f1's rows ⊆ f2's) — growing a sample never discards previously
    selected rows, so downstream artifacts built on the smaller
    sample stay valid."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(bucket < int(round(fraction * SAMPLE_BUCKETS)))


def stratified_hash_sample(
    df: DataFrame,
    bucket: Column,
    strata_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum reproducible sampling: each stratum value gets its
    own keep-fraction (e.g. {'en': 0.1, 'de': 0.5} to rebalance
    languages), unlisted strata get default_fraction. One map-literal
    probe per row — still a narrow filter."""
    for f in list(fractions.values()) + [default_fraction]:
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction must be in [0, 1], got {f}")
    thresholds = F.create_map(
        *[
            F.lit(x)
            for k, f in sorted(fractions.items())
            for x in (k, int(round(f * SAMPLE_BUCKETS)))
        ]
    )
    thr = F.coalesce(
        F.element_at(thresholds, F.col(strata_col)),
        F.lit(int(round(default_fraction * SAMPLE_BUCKETS))),
    )
    return df.where(bucket < thr)
