"""Compat-exact N-Triples parser.

Reproduces the reference parser's semantics exactly, including its
quirks (reference: /root/reference/common.go:41-66 `ParseNTriple`;
quirk ledger in SURVEY.md §2c). The scalar form is the ground truth;
`parse_nt_frame` is the vectorized pandas form used inside Spark
`mapInPandas` stages (Arrow-batched, no per-row Python in the hot
path).

Semantics (common.go:41-66):
  1. Trim surrounding whitespace; tokenize on any whitespace run
     (internal runs collapse on re-join — common_test.go:207-208).
  2. <3 tokens → error "broken input: [..]" (common.go:44-46).
  3. s = tok[0], p = tok[1].
  4. 3 or 4 tokens → o = tok[2] only (the 4th token is dropped even
     when it is not "." — quirk Q3).
  5. >4 tokens → o = " ".join(tok[2:]), dropping the LAST token when
     the trimmed line ends with "." (quirk Q4; note a dot glued to
     the final token also triggers the drop because the suffix test
     is on the line).
  6. Strip any mix of < > " from BOTH ENDS of s, p, o
     (common.go:61-63; quirk Q5 — typed/lang-tagged literals are
     mangled, inner quotes survive).
  7. Escape sequences are never unescaped (quirk Q7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_TRIM = '<>"'


class NTParseError(ValueError):
    """Parse failure; message matches the reference format."""


def _strip_trim(col: pd.Series) -> pd.Series:
    """Null-safe Trim(x, '<>\"') — a batch where every row failed to
    parse is all-NaN, and the .str accessor rejects non-string
    dtypes."""
    col = pd.Series(col, dtype="object")
    mask = col.notna()
    if mask.any():
        col.loc[mask] = col.loc[mask].str.strip(_TRIM)
    return col


def parse_ntriple(line: str) -> tuple[str, str, str]:
    """Scalar reference parser. Returns (s, p, o) or raises NTParseError.

    Mirrors /root/reference/common.go:41-66 token-for-token.
    """
    line = line.strip()
    words = line.split()
    if len(words) < 3:
        # common.go:45 formats the token slice Go-style: [a b]
        raise NTParseError("broken input: [%s]" % " ".join(words))
    s = words[0]
    p = words[1]
    if len(words) <= 4:
        o = words[2]
    else:
        if line.endswith("."):
            o = " ".join(words[2:-1])
        else:
            o = " ".join(words[2:])
    return s.strip(_TRIM), p.strip(_TRIM), o.strip(_TRIM)


def parse_nt_frame(lines: pd.Series) -> pd.DataFrame:
    """Vectorized parser over a pandas Series of raw lines.

    Returns a DataFrame with columns (s, p, o, error):
      - good rows: s/p/o filled, error = None
      - broken rows (<3 tokens): s/p/o = None, error = the reference
        message ("broken input: [..]") so callers can quarantine
        instead of crashing (the reference's -i flag,
        cmd/ntto/ntto.go:26-31).

    All operations are pandas C-level string/list kernels; no Python
    loop over rows.
    """
    lines = lines.astype("object").fillna("")
    norm = lines.str.strip()
    toks = norm.str.split()
    n = toks.str.len().fillna(0).astype(int)
    ok = n >= 3

    s = toks.str[0].where(ok)
    p = toks.str[1].where(ok)
    third = toks.str[2].where(ok)

    many = n > 4
    if many.any():
        joined_all = toks[many].str[2:].str.join(" ")
        joined_minus = toks[many].str[2:-1].str.join(" ")
        ends_dot = norm[many].str.endswith(".")
        o_many = joined_minus.where(ends_dot, joined_all)
        o = third.copy()
        o.loc[many] = o_many
    else:
        o = third

    out = pd.DataFrame(
        {
            "s": _strip_trim(s),
            "p": _strip_trim(p),
            "o": _strip_trim(o),
        }
    )
    err = pd.Series([None] * len(lines), index=lines.index, dtype="object")
    if (~ok).any():
        bad_msg = "broken input: [" + toks[~ok].str.join(" ").fillna("") + "]"
        err.loc[~ok] = bad_msg
    out["error"] = err
    # broken rows keep s/p/o as None
    out.loc[~ok, ["s", "p", "o"]] = None
    return out


_PARSE_CHECKED = False


def self_check() -> None:
    """Cross-check the vectorized parser against the scalar one on the
    pinned fixture cases. Cheap; used by tests and once at import of
    the Spark operators."""
    global _PARSE_CHECKED
    if _PARSE_CHECKED:
        return
    cases = [
        "<a> <b> <c> .",
        "a b c .",
        'a b "the deep blue c" .',
        "<a>    <b>  <the         deep blue c>",
        "a b c d",
        "<a> <b> .",
        '<a> <b> "x"@en .',
        "a b",
        "",
        "<a> <b> <c d e>.",
    ]
    frame = parse_nt_frame(pd.Series(cases))
    for i, line in enumerate(cases):
        try:
            s, p, o = parse_ntriple(line)
            assert frame.loc[i, "s"] == s, (line, frame.loc[i, "s"], s)
            assert frame.loc[i, "p"] == p
            assert frame.loc[i, "o"] == o
            assert frame.loc[i, "error"] is None
        except NTParseError as e:
            assert frame.loc[i, "error"] == str(e), (line, frame.loc[i, "error"], str(e))
    _PARSE_CHECKED = True
