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
    from pyspark.sql import SparkSession, functions as F, types as T

    from kgpipe.nt.rules import NULL_SENTINEL

    spark = SparkSession.getActiveSession()
    rewriter = PrefixRewriter(rules, mode=mode, null=null if null is not None else NULL_SENTINEL)
    bc = spark.sparkContext.broadcast(rewriter)

    @F.pandas_udf(T.StringType())
    def _abbrev(col: pd.Series) -> pd.Series:
        return bc.value.rewrite_series(col)

    out = df
    for c in columns:
        out = out.withColumn(c, _abbrev(F.col(c)))
    return out
