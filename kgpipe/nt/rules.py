"""Prefix-abbreviation rules: parsing, partitioning, and rewriting.

Reference semantics: /root/reference/common.go:22-38 (Rule type,
DumpRules), :69-85 (ParseRules), :88-96 (PartitionRules), :99-143
(sed/replace command builders). Quirk ledger: SURVEY.md §2c Q13-Q16.

Two rewrite modes:
  * ``lpm`` (engine default) — longest-prefix-match at the START of
    each term, standard CURIE semantics, implemented as a broadcast
    prefix table applied vectorized. Deterministic regardless of rule
    order.
  * ``compat`` — the reference's behavior: literal, global substring
    substitution applied sequentially in rule order (the semantics of
    the MySQL ``replace`` binary path, common.go:133-143, which the
    reference prefers when available, cmd/ntto/ntto.go:54-58). First
    rule wins on overlapping prefixes (Q13); matches anywhere in the
    term, including inside literals (Q14).

A rule whose shortcut equals the null sentinel (``<NULL>`` by
default) STRIPS the prefix instead of abbreviating (Q16,
common.go:111-114). Non-null rewrites append ``:`` after the
shortcut (common.go:114,140).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

NULL_SENTINEL = "<NULL>"


@dataclass(frozen=True)
class Rule:
    shortcut: str
    prefix: str

    def format(self) -> str:
        # common.go:36-38
        return f"{self.shortcut}\t{self.prefix}"


class RuleParseError(ValueError):
    pass


def parse_rules(text: str) -> list[Rule]:
    """Parse a rules table: ``shortcut <ws> prefix`` per line.

    Blank lines and ``#`` / ``//`` comments are skipped; a
    non-comment line with fewer than two fields is an error
    ("broken rule: ..."), matching common.go:69-85.
    """
    rules: list[Rule] = []
    for raw in text.split("\n"):
        line = raw.strip()
        if not line or line.startswith("#") or line.startswith("//"):
            continue
        fields = line.split()
        if len(fields) < 2:
            raise RuleParseError(f"broken rule: {line}")
        rules.append(Rule(shortcut=fields[0], prefix=fields[1]))
    return rules


def dump_rules(rules: list[Rule]) -> str:
    """Sorted ``shortcut\\tprefix`` dump (common.go:27-34)."""
    return "\n".join(sorted(r.format() for r in rules))


def partition_rules(rules: list[Rule], count: int) -> list[list[Rule]]:
    """Round-robin split into min(len, count) partitions
    (common.go:88-96). Obsolete under Spark (task parallelism covers
    it) but kept because partition order defines compat rewrite
    topology (SURVEY.md §2c-Q12/Q13) and it is pinned by reference
    tests."""
    count = min(len(rules), count)
    if count <= 0:
        return []
    parts: list[list[Rule]] = [[] for _ in range(count)]
    for i, rule in enumerate(rules):
        parts[i % count].append(rule)
    return parts


def sedify(rules: list[Rule], p: int, infile: str, null: str = NULL_SENTINEL) -> str:
    """Build the perl pipeline command string the reference would run
    (common.go:104-127). We never execute it — it is the reference's
    'physical plan' and is pinned by its tests; kept for parity and
    for golden-file generation."""
    parts = partition_rules(rules, p)
    cmds = []
    for i, part in enumerate(parts):
        subs = "; ".join(
            f"s@{r.prefix}@@g" if r.shortcut == null else f"s@{r.prefix}@{r.shortcut}:@g"
            for r in part
        )
        if i == 0 and infile:
            cmds.append(f"LANG=C perl -lnpe '{subs}' < '{infile}'")
        else:
            cmds.append(f"LANG=C perl -lnpe '{subs}'")
    return " | ".join(cmds)


def replacify(rules: list[Rule], infile: str, null: str = NULL_SENTINEL) -> str:
    """Build the ``replace`` command string (common.go:133-143)."""
    buf = "".join(
        f" '{r.prefix}' '' " if r.shortcut == null else f" '{r.prefix}' '{r.shortcut}:' "
        for r in rules
    )
    return f"replace {buf} < {infile}"


class PrefixRewriter:
    """Vectorized prefix rewriter over pandas Series, designed to be
    shipped to executors as a Spark broadcast variable (it is a small
    pure-Python object; the rule table is at most a few hundred
    entries — rules.go has 223).

    mode='lpm': longest-prefix-match anchored at term start.
    mode='compat': sequential literal global substring replace in
    rule order (reference `replace`-binary semantics).
    """

    def __init__(self, rules: list[Rule], mode: str = "lpm", null: str = NULL_SENTINEL):
        if mode not in ("lpm", "compat"):
            raise ValueError(f"unknown rewrite mode: {mode}")
        self.rules = list(rules)
        self.mode = mode
        self.null = null
        # replacement text: '' for the null sentinel (strip), else 'short:'
        self._repl = [
            ("" if r.shortcut == null else r.shortcut + ":", r.prefix) for r in self.rules
        ]
        # LPM order: longest prefix first so the most specific rule wins;
        # ties broken by rule order for determinism.
        self._lpm_order = sorted(
            range(len(self._repl)), key=lambda i: (-len(self._repl[i][1]), i)
        )

    # -- scalar (ground truth, used in property tests) ------------------
    def rewrite_term(self, term: str) -> str:
        if self.mode == "compat":
            for repl, prefix in self._repl:
                term = term.replace(prefix, repl)
            return term
        for i in self._lpm_order:
            repl, prefix = self._repl[i]
            if term.startswith(prefix):
                return repl + term[len(prefix) :]
        return term

    def expand_term(self, term: str) -> str:
        """Inverse of LPM rewrite for round-trip property tests
        (only meaningful for non-null rules)."""
        for r in self.rules:
            if r.shortcut != self.null and term.startswith(r.shortcut + ":"):
                return r.prefix + term[len(r.shortcut) + 1 :]
        return term

    # -- vectorized (hot path inside Arrow batches) ----------------------
    def rewrite_series(self, col: pd.Series) -> pd.Series:
        col = col.astype("object")
        if self.mode == "compat":
            out = col
            for repl, prefix in self._repl:
                out = out.str.replace(prefix, repl, regex=False)
            return out
        out = col.copy()
        unmatched = col.notna()
        for i in self._lpm_order:
            repl, prefix = self._repl[i]
            m = unmatched & out.str.startswith(prefix, na=False)
            if m.any():
                out.loc[m] = repl + col.loc[m].str[len(prefix) :]
                unmatched &= ~m
            if not unmatched.any():
                break
        return out
