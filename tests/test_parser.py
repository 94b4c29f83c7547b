"""Parser parity with the reference (common_test.go:185-218) plus the
quirk ledger (SURVEY.md §2c), scalar and vectorized cross-checked."""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from kgpipe.nt.parser import NTParseError, parse_nt_frame, parse_ntriple, self_check

# The 9 pinned cases from /root/reference/common_test.go:185-209.
REFERENCE_CASES = [
    (
        "<http://d-nb.info/gnd/1-2> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://d-nb.info/standards/elementset/gnd#SeriesOfConferenceOrEvent> .",
        (
            "http://d-nb.info/gnd/1-2",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://d-nb.info/standards/elementset/gnd#SeriesOfConferenceOrEvent",
        ),
    ),
    ("a b c .", ("a", "b", "c")),
    ('a b "the deep blue c" .', ("a", "b", "the deep blue c")),
    ('a <b> "the deep blue c" .', ("a", "b", "the deep blue c")),
    ('<a> <b> "the deep blue c" .', ("a", "b", "the deep blue c")),
    ("<a> <b> <the deep blue c> .", ("a", "b", "the deep blue c")),
    ("<a> <b> <the deep blue c>", ("a", "b", "the deep blue c")),
    ("<a> <b> <the deep blue c>", ("a", "b", "the deep blue c")),
    ("<a>    <b>  <the         deep blue c>", ("a", "b", "the deep blue c")),
]

# Quirk rows from SURVEY.md §2c.
QUIRK_CASES = [
    ("a b c d", ("a", "b", "c")),  # Q3: 4th token dropped even when not '.'
    ("<a> <b> .", ("a", "b", ".")),  # Q6: object is literally '.'
    ('<a> <b> "x"@en .', ("a", "b", 'x"@en')),  # Q5: lang tag mangled
    (
        '<a> <b> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        ("a", "b", '5"^^<http://www.w3.org/2001/XMLSchema#integer'),
    ),  # Q5: typed literal mangled, inner quote kept, trailing > eaten
    ("<a> <b> <c d e>.", ("a", "b", "c d")),  # >4 tokens, glued dot drops last token
    ("<a> <b> <c d> e", ("a", "b", "c d> e")),  # >4 tokens, no trailing dot keeps all
    ("  <a>\t<b>\t<c> .  ", ("a", "b", "c")),  # surrounding ws trimmed, tabs split
]

ERROR_CASES = ["a b", "", "   ", "# comment", "onlyone"]


@pytest.mark.parametrize("line,expected", REFERENCE_CASES + QUIRK_CASES)
def test_scalar_parse(line, expected):
    assert parse_ntriple(line) == expected


@pytest.mark.parametrize("line", ERROR_CASES)
def test_scalar_parse_errors(line):
    with pytest.raises(NTParseError) as ei:
        parse_ntriple(line)
    assert str(ei.value).startswith("broken input: [")


def test_vectorized_matches_scalar_on_fixtures():
    lines = [c[0] for c in REFERENCE_CASES + QUIRK_CASES] + ERROR_CASES
    frame = parse_nt_frame(pd.Series(lines))
    for i, line in enumerate(lines):
        try:
            s, p, o = parse_ntriple(line)
            assert (frame.loc[i, "s"], frame.loc[i, "p"], frame.loc[i, "o"]) == (s, p, o)
            assert frame.loc[i, "error"] is None
        except NTParseError as e:
            assert frame.loc[i, "s"] is None
            assert frame.loc[i, "error"] == str(e)


def test_self_check():
    self_check()


_token = st.text(
    alphabet=st.characters(blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs")),
    min_size=1,
    max_size=12,
)


@given(st.lists(_token, min_size=0, max_size=8), st.sampled_from([" ", "  ", "\t", " \t "]))
@settings(max_examples=300, deadline=None)
def test_vectorized_matches_scalar_property(tokens, sep):
    line = sep.join(tokens)
    frame = parse_nt_frame(pd.Series([line]))
    try:
        s, p, o = parse_ntriple(line)
        assert (frame.loc[0, "s"], frame.loc[0, "p"], frame.loc[0, "o"]) == (s, p, o)
    except NTParseError as e:
        assert frame.loc[0, "error"] == str(e)


@given(st.lists(_token, min_size=3, max_size=3))
@settings(max_examples=200, deadline=None)
def test_wellformed_roundtrip(tokens):
    """Parse of a well-formed generated NT line yields the generating
    (s,p,o) — SURVEY.md §5.2-3(b). Tokens restricted to not contain
    the trim charset or '.' edge interactions."""
    s, p, o = tokens
    if any(ch in t for t in tokens for ch in '<>"'):
        return
    if o == "." or o.endswith("."):
        return
    line = f"<{s}> <{p}> <{o}> ."
    assert parse_ntriple(line) == (s, p, o)
