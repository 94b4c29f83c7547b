"""Connected components over a sameAs edge set → canonical_map.

Implements the alternating large-star / small-star algorithm
("Connected Components in MapReduce and Beyond", Kiveris et al.,
SoCC 2014 — PAPERS.md) entirely in DataFrame operations:

  large-star: for each node u, hang every neighbor v > u off
              m(u) = min(N(u) ∪ {u})
  small-star: orient edges (big → small); hang every small neighbor
              and u itself off m(u) = min over the small side

Both stars are a groupBy().agg(min()) plus a join — Spark performs
map-side partial aggregation for min() automatically, so the hot
high-degree nodes (owl:sameAs hubs) combine before the shuffle; the
join side is additionally covered by AQE skew-join splitting
(enabled in kgpipe.session).

Node ids are the URI STRINGS themselves: min() over strings gives
canon_id = lexicographic min of the component, which is exactly the
golden labeling of FIXTURES.md F4 — and avoids a 64-bit-hash
collision budget that does not close at 10^12 nodes.

Converges in O(log n) rounds; every round ends with
localCheckpoint() to truncate lineage (iterative self-joins
otherwise grow the plan exponentially — SURVEY.md §7 hard-part 1).

The reference has no graph stage at all (SURVEY.md §2b "Joins:
none"); this is new capability mandated by the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    # symmetrize: neighborhood of u is over undirected edges
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # m(u) = min(N(u) ∪ {u}); min() gets map-side partial agg for free
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("src", "mn").alias("m"))
    )
    # no distinct here: duplicates are bounded (≤2 copies per edge)
    # and the small-star that always follows ends in a distinct —
    # saves one full shuffle per round
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient (big, small); u's small-neighborhood min is the new hub
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    hang_neighbors = (
        oriented.join(mins, "u").select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    hang_self = mins.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return (
        hang_neighbors.union(hang_self)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _checkpoint_with_fingerprint(edges: DataFrame) -> tuple[DataFrame, tuple[int, int]]:
    """Materialize one round (lineage truncation) and collect its
    set fingerprint IN THE SAME JOB via an Observation — halving the
    per-round fixed job latency vs a separate fingerprint pass.

    bit_xor, not sum: ANSI mode (Spark 4 default) makes sum() of
    64-bit hashes overflow; xor over a distinct edge set is a valid
    set fingerprint (paired with the count to break even-multiplicity
    cancellation — though the round output is distinct by
    construction)."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = edges.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64(F.col("src"), F.col("dst"))), F.lit(0)).alias("h"),
    )
    out = observed.localCheckpoint(eager=True)
    m = obs.get  # populated by the checkpoint job — no extra action
    return out, (int(m["n"]), int(m["h"]))


def connected_components(
    edges: DataFrame, max_iter: int = 25, checkpoint_every: int = 1
) -> DataFrame:
    """edges(src, dst) → canonical_map(uri, canon_id).

    canon_id is the lexicographic min URI of each component. Nodes
    that appear only as component minima map to themselves; callers
    union singleton nodes separately if they track a node universe
    wider than the edge set (see canonical_map_for_nodes).
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # materialize the input ONCE before iterating: round 1 references
    # e twice (symmetrization), and without this the entire upstream
    # edge derivation (scans, distincts, normalization) recomputes
    # per reference — measured as the bulk of round-1 latency.
    # persist + count rather than localCheckpoint: checkpointing a
    # complex plan (windows + unions, e.g. the LSH linker's) trips a
    # Spark attribute-resolution bug ("key not found: src#N"), and
    # lineage truncation is already handled by the per-round
    # checkpoints. MEMORY_AND_DISK → spills, not OOM.
    from pyspark.storagelevel import StorageLevel

    e0 = e.persist(StorageLevel.MEMORY_AND_DISK)
    e0.count()
    e = e0
    prev_fp = None
    for it in range(max_iter):
        e = _small_star(_large_star(e))
        # one job per round: lineage-truncating checkpoint + the
        # convergence fingerprint, fused via Observation
        e, fp = _checkpoint_with_fingerprint(e)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    e0.unpersist(blocking=False)

    # at the fixed point the edge set is a star forest: (node → root)
    members = e.select(F.col("src").alias("uri"), F.col("dst").alias("canon_id"))
    roots = e.select(F.col("dst").alias("uri"), F.col("dst").alias("canon_id")).distinct()
    return members.union(roots).distinct()


def canonical_map_for_nodes(nodes: DataFrame, edges: DataFrame, **kw) -> DataFrame:
    """Canonical map covering a full node universe: nodes absent from
    the edge set become their own canon_id. nodes must have a `uri`
    column."""
    cmap = connected_components(edges, **kw)
    uni = nodes.select("uri").distinct()
    singles = uni.join(cmap, "uri", "left_anti").select(
        "uri", F.col("uri").alias("canon_id")
    )
    return cmap.union(singles)
