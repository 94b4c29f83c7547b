"""Stage 3 — abbreviate: namespace-prefix rewrite of s/p/o.

Spark lift of kgpipe.nt.rules.PrefixRewriter. The rule table is tiny
(≤ a few hundred rows — the reference ships 223,
/root/reference/rules.go), so there is deliberately NO join here:
the rewriter ships to executors as a Spark broadcast variable and
runs as a scalar pandas UDF over each term column. Narrow transform,
no shuffle — this is the Spark analogue of the reference's broadcast
of rules into every perl pipe stage
(/root/reference/common.go:104-127).

Default mode 'lpm' = longest-prefix-match CURIE semantics; 'compat'
replays the reference's sequential literal substitution (SURVEY.md
§2c Q13-Q16).
"""

from __future__ import annotations

import pandas as pd

from kgpipe.nt.rules import PrefixRewriter, Rule


def abbreviate_columns(
    df, columns: list[str], rules: list[Rule], mode: str = "lpm",
    null: str | None = None,
):
    """Rewrite each named string column through the broadcast rule
    table. Returns df with the columns replaced in place. `null`
    overrides the strip-sentinel shortcut (ntto -n)."""
    from pyspark.sql import functions as F, types as T

    from kgpipe.nt.rules import NULL_SENTINEL

    # the frame's own session, not the thread-local active one (None
    # on non-driver threads, e.g. foreachBatch callbacks)
    spark = df.sparkSession
    rewriter = PrefixRewriter(rules, mode=mode, null=null if null is not None else NULL_SENTINEL)
    bc = spark.sparkContext.broadcast(rewriter)

    @F.pandas_udf(T.StringType())
    def _abbrev(col: pd.Series) -> pd.Series:
        return bc.value.rewrite_series(col)

    out = df
    for c in columns:
        out = out.withColumn(c, _abbrev(F.col(c)))
    return out


def compat_replace_expr(col, rules: list[Rule], null: str | None = None):
    """JVM-side compat rewrite: sequential literal global substring
    replacement in rule order — the exact semantics of the reference's
    perl/replace pipeline (/root/reference/common.go:104-143) and of
    PrefixRewriter(mode='compat'), evaluated inside the JVM with no
    Python crossing at all.

    Plan shape: ONE `aggregate` fold over a plan-literal
    array<struct<f,t>> of (prefix, replacement) pairs, whose lambda
    body is a single `replace` call. Inlining 223 nested replace
    expressions instead would blow up codegen/JIT (the 64-hash JIT
    stall all over again); the fold keeps the expression tree O(1) in
    rule count while still applying rules strictly in order.

    MEASURED: ~5k lines/s/core on the 223-rule DefaultRules —
    UTF8String.replace runs a naive byte search per rule and the HOF
    pays per-element lambda machinery, so this is ~30× SLOWER than
    the Arrow-batched compiled rewriter (abbreviate_lines). Kept for
    rule tables of a few entries and for plans that must stay free of
    Python workers; every hot path uses abbreviate_lines."""
    from pyspark.sql import functions as F

    from kgpipe.nt.rules import NULL_SENTINEL

    if null is None:
        null = NULL_SENTINEL
    if not rules:
        return col
    pairs = F.array(
        *[
            F.struct(
                F.lit(r.prefix).alias("f"),
                F.lit("" if r.shortcut == null else r.shortcut + ":").alias("t"),
            )
            for r in rules
        ]
    )
    return F.aggregate(pairs, col, lambda acc, p: F.replace(acc, p["f"], p["t"]))


def abbreviate_lines(
    df,
    rules: list[Rule],
    null: str | None = None,
    line_col: str = "value",
    engine: str = "pandas",
):
    """Raw-line abbreviation: the Spark analogue of `ntto -a` WITHOUT
    `-j` (cmd/ntto/ntto.go:144-166 — the perl pipeline's stdout IS the
    output, nothing is parsed). Original term framing (angle brackets,
    literal quotes) survives byte-for-byte because only substring
    substitution happens. Narrow transform, no shuffle.

    engine='pandas' (default): broadcast PrefixRewriter applied as an
    Arrow-batched scalar pandas UDF — the rewriter compiles the rule
    table to one priority-ordered trie-regex pass when provably
    equivalent to the sequential reference semantics (~160k lines/s
    per core on the 223-rule DefaultRules; the provably-unsafe rows
    and rule tables transparently take the per-rule sequential path).
    engine='jvm': pure expression fold, no Python workers — ~30×
    slower (see compat_replace_expr), but the plan stays JVM-only."""
    from pyspark.sql import functions as F, types as T

    from kgpipe.nt.rules import NULL_SENTINEL

    if engine == "jvm":
        return df.withColumn(
            line_col, compat_replace_expr(F.col(line_col), rules, null)
        )
    if engine != "pandas":
        raise ValueError(f"unknown abbrev engine: {engine}")
    # the frame's own session, not getActiveSession() (thread-local —
    # None from non-driver threads)
    spark = df.sparkSession
    rewriter = PrefixRewriter(
        rules, mode="compat", null=null if null is not None else NULL_SENTINEL
    )
    bc = spark.sparkContext.broadcast(rewriter)

    @F.pandas_udf(T.StringType())
    def _rewrite(col: pd.Series) -> pd.Series:
        return bc.value.rewrite_series(col)

    return df.withColumn(line_col, _rewrite(F.col(line_col)))


def expand_curie_expr(col, rules, null: str | None = None):
    """INVERSE of LPM abbreviation, as a pure-JVM expression: a CURIE
    `shortcut:rest` whose shortcut is in the rule table expands to
    `prefix || rest`; anything else (full IRIs, literals, bare
    suffixes from <NULL> strips — irrecoverable by construction)
    passes through unchanged. The reference has no expand direction
    (ntto only shrinks, README.md:6-9); any consumer of abbreviated
    NT needs this to get resolvable IRIs back.

    Duplicate shortcuts in the table (`atom`, `virtrdf` —
    /root/reference/rules.go:31,133-134,222; SURVEY.md §2c-Q13) make
    abbreviation lossy: expansion takes the FIRST rule, mirroring the
    first-wins order the sequential rewriter applies. Lookup is one
    map literal probe per value — no join, no shuffle, no UDF."""
    from pyspark.sql import functions as F

    from kgpipe.nt.rules import NULL_SENTINEL

    sentinel = null if null is not None else NULL_SENTINEL
    first: dict[str, str] = {}
    for r in rules:
        if r.shortcut != sentinel and r.shortcut not in first:
            first[r.shortcut] = r.prefix
    mapping = F.create_map(
        *[F.lit(x) for kv in sorted(first.items()) for x in kv]
    )
    sc = F.split_part(col, F.lit(":"), F.lit(1))
    prefix = F.element_at(mapping, sc)
    rest = col.substr(F.length(sc) + 2, F.length(col))
    return F.when(
        col.contains(":") & prefix.isNotNull(), F.concat(prefix, rest)
    ).otherwise(col)


def expand_columns(df, columns: list[str], rules, null: str | None = None):
    """Expand CURIEs in the named columns back to full IRIs (see
    expand_curie_expr). Roundtrip law: expand(abbreviate_lpm(x)) == x
    for rule sets with unique shortcuts (pytest-pinned; property-
    tested for the 16-rule fixture table)."""
    out = df
    for c in columns:
        out = out.withColumn(c, expand_curie_expr(out[c], rules, null=null))
    return out
