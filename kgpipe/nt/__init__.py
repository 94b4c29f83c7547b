"""N-Triples parsing and prefix-rule semantics.

Two implementations of every operation:
  - a scalar pure-Python reference (the semantic ground truth,
    property-tested against the quirk ledger in SURVEY.md §2c), and
  - a vectorized pandas form used inside Arrow-batched Spark stages.
The vectorized form is cross-checked against the scalar form in tests.
"""

from kgpipe.nt.parser import parse_ntriple, parse_nt_frame, NTParseError
from kgpipe.nt.rules import (
    Rule,
    parse_rules,
    dump_rules,
    partition_rules,
    sedify,
    replacify,
    PrefixRewriter,
)

__all__ = [
    "parse_ntriple",
    "parse_nt_frame",
    "NTParseError",
    "Rule",
    "parse_rules",
    "dump_rules",
    "partition_rules",
    "sedify",
    "replacify",
    "PrefixRewriter",
]
