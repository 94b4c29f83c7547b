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


def write_nt(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """triples(s, p, o, ...) → N-Triples-shaped lines `<s> <p> <o> .`.

    NOT byte-identical to `ntto -a` output: the reference substitutes
    prefixes textually IN PLACE, so abbreviated terms keep their
    original angle brackets (`<gnd:123>`) and literals keep their
    quotes, while this sink emits CURIEs/literals bare and re-brackets
    only terms that still look like full IRIs. The triple VALUES
    (after stripping framing) are identical; byte-level consumers of
    ntto's NT output should diff term-wise, not line-wise."""

    def term(c: str) -> F.Column:
        # IRIs keep angle brackets only if they still look like IRIs
        return F.when(
            F.col(c).startswith("http://") | F.col(c).startswith("https://"),
            F.concat(F.lit("<"), F.col(c), F.lit(">")),
        ).otherwise(F.col(c))

    line = F.concat_ws(" ", term("s"), term("p"), term("o"), F.lit("."))
    triples.select(line.alias("value")).write.mode(mode).text(path)
