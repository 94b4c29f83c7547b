"""Rules parity with the reference: ParseRules/PartitionRules/Sedify
pinned cases (common_test.go:9-183), DumpRules, and both rewrite
modes including the overlap quirks Q13-Q16."""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from kgpipe.fixtures import RULES_16_TEXT, RULES_OVERLAP_TEXT
from kgpipe.nt.rules import (
    PrefixRewriter,
    Rule,
    RuleParseError,
    dump_rules,
    parse_rules,
    partition_rules,
    replacify,
    sedify,
)


# --- ParseRules (common_test.go:9-67) --------------------------------
def test_parse_rules_basic():
    assert parse_rules("a hello\n      b world") == [
        Rule("a", "hello"),
        Rule("b", "world"),
    ]


def test_parse_rules_comments_blank():
    text = "a hello\n\n      // do not mix, unless you have to\n      # just a comment\n\n      b world"
    assert parse_rules(text) == [Rule("a", "hello"), Rule("b", "world")]


def test_parse_rules_broken():
    with pytest.raises(RuleParseError) as ei:
        parse_rules("a\n\n      # c\n\n      b world")
    assert str(ei.value) == "broken rule: a"


def test_parse_reference_rules_file():
    rules = parse_rules(RULES_16_TEXT)
    assert len(rules) == 16
    assert rules[0] == Rule("dbp", "http://dbpedia.org/resource/")
    assert rules[3] == Rule("gnd", "http://d-nb.info/gnd/")


def test_dump_rules_sorted():
    rules = [Rule("b", "world"), Rule("a", "hello")]
    assert dump_rules(rules) == "a\thello\nb\tworld"


# --- PartitionRules (common_test.go:69-116) ---------------------------
def test_partition_rules():
    a, b, c = Rule("a", "aaaa"), Rule("b", "bbbb"), Rule("c", "cccc")
    assert partition_rules([a, b], 2) == [[a], [b]]
    assert partition_rules([a, b], 1) == [[a, b]]
    assert partition_rules([a, b, c], 3) == [[a], [b], [c]]
    assert partition_rules([a, b], 5) == [[a], [b]]  # count clamped


# --- Sedify command strings (common_test.go:118-174) -------------------
SEDIFY_CASES = [
    (2, "", "LANG=C perl -lnpe 's@aaaa@a:@g' | LANG=C perl -lnpe 's@bbbb@b:@g'"),
    (1, "", "LANG=C perl -lnpe 's@aaaa@a:@g; s@bbbb@b:@g'"),
    (1, "hello.txt", "LANG=C perl -lnpe 's@aaaa@a:@g; s@bbbb@b:@g' < 'hello.txt'"),
    (
        2,
        "hello.txt",
        "LANG=C perl -lnpe 's@aaaa@a:@g' < 'hello.txt' | LANG=C perl -lnpe 's@bbbb@b:@g'",
    ),
]


@pytest.mark.parametrize("p,infile,expected", SEDIFY_CASES)
def test_sedify(p, infile, expected):
    rules = [Rule("a", "aaaa"), Rule("b", "bbbb")]
    assert sedify(rules, p, infile) == expected


def test_sedify_six_rules_round_robin():
    rules = [Rule(s, s * 4) for s in "abcdef"]
    assert (
        sedify(rules, 4, "hello.txt")
        == "LANG=C perl -lnpe 's@aaaa@a:@g; s@eeee@e:@g' < 'hello.txt' | "
        "LANG=C perl -lnpe 's@bbbb@b:@g; s@ffff@f:@g' | "
        "LANG=C perl -lnpe 's@cccc@c:@g' | LANG=C perl -lnpe 's@dddd@d:@g'"
    )


def test_replacify():
    rules = [Rule("a", "aaaa"), Rule("<NULL>", "bbbb")]
    assert replacify(rules, "in.nt") == "replace  'aaaa' 'a:'  'bbbb' ''  < in.nt"


# --- Rewriter semantics ------------------------------------------------
RULES16 = parse_rules(RULES_16_TEXT)
OVERLAP = parse_rules(RULES_OVERLAP_TEXT)


def test_lpm_basic():
    rw = PrefixRewriter(RULES16, mode="lpm")
    assert rw.rewrite_term("http://d-nb.info/gnd/118540238") == "gnd:118540238"
    assert rw.rewrite_term("http://dbpedia.org/resource/Berlin") == "dbp:Berlin"
    assert rw.rewrite_term("http://unknown.org/x") == "http://unknown.org/x"


def test_lpm_picks_longest_prefix():
    # Q13: under LPM the longer 'category' prefix wins over 'dbp'.
    rw = PrefixRewriter(OVERLAP, mode="lpm")
    assert rw.rewrite_term("http://dbpedia.org/resource/Category:City") == "category:City"
    assert rw.rewrite_term("http://dbpedia.org/resource/City") == "dbp:City"
    assert rw.rewrite_term("http://www.w3.org/1999/xhtml/vocab#next") == "xhv:next"


def test_compat_first_rule_wins():
    # Q13: the reference applies rules sequentially — dbp fires first.
    rw = PrefixRewriter(OVERLAP, mode="compat")
    assert rw.rewrite_term("http://dbpedia.org/resource/Category:City") == "dbp:Category:City"


def test_compat_substring_anywhere():
    # Q14: compat rewrites inside literals too.
    rw = PrefixRewriter(RULES16, mode="compat")
    assert (
        rw.rewrite_term("see http://dbpedia.org/resource/Berlin page")
        == "see dbp:Berlin page"
    )
    # LPM is anchored: no match mid-string.
    rw2 = PrefixRewriter(RULES16, mode="lpm")
    assert (
        rw2.rewrite_term("see http://dbpedia.org/resource/Berlin page")
        == "see http://dbpedia.org/resource/Berlin page"
    )


def test_null_rule_strips():
    # Q16
    for mode in ("lpm", "compat"):
        rw = PrefixRewriter(OVERLAP, mode=mode)
        assert rw.rewrite_term("http://stripme.example.org/thing") == "thing"


def test_vectorized_matches_scalar():
    terms = [
        "http://d-nb.info/gnd/1",
        "http://dbpedia.org/resource/Category:City",
        "http://dbpedia.org/resource/City",
        "http://www.w3.org/1999/xhtml/vocab#next",
        "http://www.w3.org/1999/xhtml/foo",
        "http://stripme.example.org/x",
        "plain literal",
        "see http://dbpedia.org/resource/B page",
        "",
    ]
    for mode in ("lpm", "compat"):
        rw = PrefixRewriter(OVERLAP, mode=mode)
        vec = rw.rewrite_series(pd.Series(terms)).tolist()
        assert vec == [rw.rewrite_term(t) for t in terms]


def test_perl_parity_compat():
    """Run the reference's actual perl pipeline (sedify builds it) on
    sample lines and compare with compat-mode rewriting. Perl's s@@g
    is regex; on these rule prefixes (no metacharacter collisions in
    inputs) it coincides with literal semantics."""
    import subprocess

    rw = PrefixRewriter(RULES16, mode="compat")
    lines = [
        "<http://d-nb.info/gnd/1-2> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://d-nb.info/standards/elementset/gnd#X> .",
        '<http://viaf.org/viaf/5> <http://xmlns.com/foaf/0.1/name> "a b" .',
    ]
    cmd = sedify(RULES16, 1, "")
    out = subprocess.run(
        cmd, shell=True, input="\n".join(lines), capture_output=True, text=True
    )
    got = out.stdout.rstrip("\n").split("\n")
    assert got == [rw.rewrite_term(l) for l in lines]


@given(st.integers(0, 10_000))
@settings(max_examples=100, deadline=None)
def test_lpm_roundtrip_property(k):
    """expand(abbrev(x)) == x on a prefix-free rule set (SURVEY §5.2-3a)."""
    rw = PrefixRewriter(RULES16, mode="lpm")
    uri = f"http://d-nb.info/gnd/{k}"
    assert rw.expand_term(rw.rewrite_term(uri)) == uri


# ---- compiled single-pass engine (the vectorized hot path) ----------

def _defaultrules():
    from kgpipe.nt.default_rules import DEFAULT_RULES_TEXT

    return parse_rules(DEFAULT_RULES_TEXT)


def test_singlepass_compiles_for_defaultrules():
    rw = PrefixRewriter(_defaultrules(), mode="compat")
    assert rw._compat_rx is not None, (
        "the 223-rule DefaultRules table must take the compiled "
        "single-pass path (the whole point of the engine)"
    )


def test_singlepass_disabled_for_strip_rules():
    """A null rule DELETES text (glues neighbors) — no static check
    bounds that, so the fast path must refuse and fall back."""
    rules = parse_rules("<NULL> http://example.org/\ndc http://purl.org/dc/elements/1.1/")
    rw = PrefixRewriter(rules, mode="compat")
    assert rw._compat_rx is None
    got = rw.rewrite_series(pd.Series(["<http://example.org/a> x ."])).tolist()
    assert got == ["<a> x ."]


def test_singlepass_boundary_spanning_rows_take_sequential_path():
    """The one channel the static checks cannot kill: a sequential
    pass matching ACROSS original text and an earlier substitution.
    These rows must be detected (suspect scan) and produce the exact
    sequential answer."""
    rules = _defaultrules()
    rw = PrefixRewriter(rules, mode="compat")
    adversarial = [
        # '...Podcast-1.0.dt' + dbp-URI: pass 0 creates the final 'd'
        # that completes the itunes DTD pattern for pass 150
        "http://www.itunes.com/DTDs/Podcast-1.0.dt" "http://dbpedia.org/resource/X",
        "urn:yahoo:map" "http://schema.org/name",
        "http://www.w3.org/2005/Ato" "http://search.yahoo.com/mrss/",
        # adjacent match sites
        "http://dbpedia.org/resource/http://d-nb.info/gnd/5",
        "http://dbpedia.org/resource/" "http://dbpedia.org/resource/",
        # interior-segment completion (urn:yah + replaced + maps)
        "urn:yah" "http://dbpedia.org/resource/" "maps",
    ]
    got = rw.rewrite_series(pd.Series(adversarial, dtype="object")).tolist()
    assert got == [rw.rewrite_term(x) for x in adversarial]


def test_singlepass_priority_on_prefix_related_patterns():
    """DefaultRules regression: rss(185) is a prefix of both
    content(125) and slash(192). content (earlier) must win its span;
    rss must beat slash everywhere (its sequential pass destroys
    every slash site)."""
    rw = PrefixRewriter(_defaultrules(), mode="compat")
    cases = {
        "http://purl.org/rss/1.0/modules/content/x": "content:x",
        "http://purl.org/rss/1.0/modules/slash/x": "rss:modules/slash/x",
        "http://purl.org/rss/1.0/title": "rss:title",
    }
    for term, want in cases.items():
        assert rw.rewrite_term(term) == want  # ground truth agrees
        got = rw.rewrite_series(pd.Series([term])).tolist()[0]
        assert got == want


@given(st.data())
@settings(max_examples=300, deadline=None)
def test_singlepass_fuzz_equals_sequential(data):
    """Property: the vectorized rewrite (compiled single pass +
    suspect routing) equals the scalar sequential ground truth on
    arbitrary concatenations of rule prefixes, prefix fragments and
    noise — both modes, both rule tables."""
    rules = _defaultrules()
    prefixes = [r.prefix for r in rules]
    frag = st.sampled_from(prefixes).flatmap(
        lambda p: st.integers(1, len(p)).map(lambda k: p[:k])
    )
    tail = st.sampled_from(prefixes).flatmap(
        lambda p: st.integers(0, len(p) - 1).map(lambda k: p[k:])
    )
    atom = st.one_of(
        st.sampled_from(prefixes), frag, tail,
        st.sampled_from(["<", ">", '"', " ", ".", "x", "d", "s", "m", "y:", "oo:"]),
    )
    s = data.draw(st.lists(atom, min_size=0, max_size=6).map("".join))
    for mode in ("compat", "lpm"):
        rw = PrefixRewriter(rules, mode=mode)
        got = rw.rewrite_series(pd.Series([s], dtype="object")).tolist()[0]
        assert got == rw.rewrite_term(s), (mode, s)


# --- CURIE expansion (inverse rewrite) ------------------------------
def test_expand_curie_roundtrip_and_passthrough(spark):
    """expand(abbrev_lpm(x)) == x on the unique-shortcut fixture
    table; non-CURIE values (full IRIs, literals, colon-free terms)
    pass through untouched; duplicate shortcuts expand first-wins
    (the order the sequential rewriter applies — Q13)."""
    from pyspark.sql import functions as F

    from kgpipe.fixtures import RULES_16_TEXT
    from kgpipe.nt.rules import parse_rules
    from kgpipe.operators.abbrev import expand_curie_expr

    rules = parse_rules(RULES_16_TEXT)
    cases = [
        ("gnd:118540238", "http://d-nb.info/gnd/118540238"),
        ("rdf:type", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
        ("plain literal", "plain literal"),
        ("http://unmapped.org/x", "http://unmapped.org/x"),
        ("noprefix", "noprefix"),
        ("unknown:rest", "unknown:rest"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "v string")
    got = [r.out for r in df.select(expand_curie_expr(F.col("v"), rules).alias("out")).collect()]
    assert got == [e for _, e in cases]

    # duplicate shortcuts: first rule wins (atom appears twice in
    # DefaultRules — rules.go:133-134)
    from kgpipe.nt.rules import Rule

    dup = [Rule("a", "http://first.example/"), Rule("a", "http://second.example/")]
    df2 = spark.createDataFrame([("a:x",)], "v string")
    out = df2.select(expand_curie_expr(F.col("v"), dup).alias("out")).collect()[0].out
    assert out == "http://first.example/x"
