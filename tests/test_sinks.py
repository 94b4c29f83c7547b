"""LDJ / NT sinks: multiset equivalence with the reference's output
contract (order-insensitive, value-level JSON comparison — Q10/Q11)."""

import json
import glob

from pyspark.sql import functions as F

from kgpipe.operators.sinks import write_ldj, write_nt


def _read_lines(path):
    out = []
    for f in glob.glob(f"{path}/part-*"):
        with open(f) as fh:
            out.extend(l for l in fh.read().splitlines() if l)
    return out


def test_write_ldj_roundtrip(spark, tmp_path):
    triples = spark.createDataFrame(
        [("gnd:1", "rdf:type", "dnb:X"), ("a", "b", 'literal with "quotes" & <brackets>')],
        ["s", "p", "o"],
    )
    out = str(tmp_path / "ldj")
    write_ldj(triples, out)
    got = sorted(
        (d["s"], d["p"], d["o"]) for d in map(json.loads, _read_lines(out))
    )
    assert got == [
        ("a", "b", 'literal with "quotes" & <brackets>'),
        ("gnd:1", "rdf:type", "dnb:X"),
    ]


def test_write_nt_shape(spark, tmp_path):
    triples = spark.createDataFrame(
        [("http://ex.org/s", "gnd:p", "obj")], ["s", "p", "o"]
    )
    out = str(tmp_path / "nt")
    write_nt(triples, out)
    assert _read_lines(out) == ["<http://ex.org/s> gnd:p obj ."]


def test_nt_roundtrips_through_parser(spark, tmp_path):
    """NT written by the sink parses back to the same triples via the
    compat parser (for bare single-token terms)."""
    from kgpipe.operators.parse import parse_lines_to_triples

    triples = spark.createDataFrame(
        [("http://ex.org/a", "http://ex.org/p", "http://ex.org/b"), ("s1", "p1", "o1")],
        ["s", "p", "o"],
    )
    out = str(tmp_path / "nt2")
    write_nt(triples, out)
    back = parse_lines_to_triples(
        spark.read.text(out).withColumnRenamed("value", "line")
    )
    got = {(r.s, r.p, r.o) for r in back.where(F.col("s").isNotNull()).collect()}
    assert got == {(r.s, r.p, r.o) for r in triples.collect()}
