"""Output sinks beyond the parquet/Iceberg tables.

LDJ (line-delimited JSON) is the reference's `-j` output: one
``{"s":...,"p":...,"o":...}`` object per line
(/root/reference/cmd/ntto/ntto.go:36-50). Notes for byte-level
consumers (SURVEY.md §2c):
  - Q10: the reference's line ORDER is nondeterministic (goroutine
    fan-in), and so is ours (task order) — consumers must treat the
    file as a multiset;
  - Q11: Go's json.Marshal HTML-escapes <>& (\\u003c…); Spark's
    to_json does not. Values are identical after JSON parsing, which
    is the compat contract.

NT text output mirrors the reference's abbreviated-NT sink
(ntto.go:144-158).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_ldj(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """triples(s, p, o, ...) → LDJ text files at `path`."""
    (
        triples.select(F.to_json(F.struct("s", "p", "o")).alias("value"))
        .write.mode(mode)
        .text(path)
    )


def write_nt_compat(
    lines_df: DataFrame,
    rules,
    path: str,
    null: str | None = None,
    mode: str = "overwrite",
    line_col: str = "value",
) -> None:
    """BYTE-compatible `ntto -a` sink: the raw line stream with prefix
    substitutions applied in place and nothing else — original term
    framing (angle brackets, literal quotes, even trailing garbage)
    survives verbatim, because `ntto -a` without `-j` IS just the
    perl/replace pipeline's stdout redirected to the output file
    (/root/reference/cmd/ntto/ntto.go:144-166). No parse, no
    filtering: broken lines, blank lines and all pass through exactly
    as perl's -lnpe would echo them. Line ORDER across part files is
    a multiset contract (Q10), same as the reference's worker fan-in."""
    from kgpipe.operators.abbrev import abbreviate_lines

    out = abbreviate_lines(lines_df.select(line_col), rules, null=null, line_col=line_col)
    out.select(F.col(line_col).alias("value")).write.mode(mode).text(path)


def write_nt(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """triples(s, p, o, ...) → N-Triples-shaped lines `<s> <p> <o> .`.

    NOT byte-identical to `ntto -a` output: this sink works from
    PARSED terms, so abbreviated terms are emitted bare and only
    still-full IRIs are re-bracketed. For byte-level parity with
    `ntto -a` use `write_nt_compat`, which substitutes in place on
    the raw line stream like the reference does. The triple VALUES
    (after stripping framing) are identical between the two; this
    form is the engine-native one for downstream parsed consumers."""

    def term(c: str) -> F.Column:
        # IRIs keep angle brackets only if they still look like IRIs
        return F.when(
            F.col(c).startswith("http://") | F.col(c).startswith("https://"),
            F.concat(F.lit("<"), F.col(c), F.lit(">")),
        ).otherwise(F.col(c))

    line = F.concat_ws(" ", term("s"), term("p"), term("o"), F.lit("."))
    triples.select(line.alias("value")).write.mode(mode).text(path)
