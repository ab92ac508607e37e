"""N-Triples export/import (sources/rdf.py): edges and nodes round-trip
through the distributed text sink; forbidden IRI chars percent-encode;
literals escape; malformed lines are dropped on read."""

from __future__ import annotations

import os

from kg_microbe_merge_spark.sources.rdf import (
    RDF_TYPE,
    RDFS_LABEL,
    edges_to_ntriples,
    nodes_to_ntriples,
    read_ntriples,
    write_ntriples,
)

BASE = "https://kg.example/"


def test_edges_roundtrip(spark, tmp_path):
    edges = spark.createDataFrame(
        [
            ("CHEBI:1", "biolink:related_to", "NCBITaxon:9606"),
            ("a b", 'q"x', "brace{}|caret^tick`slash\\"),
            (None, "p", "o"),  # NULL endpoint -> dropped
        ],
        "subject string, predicate string, object string",
    )
    out = os.path.join(tmp_path, "edges_nt")
    write_ntriples(edges_to_ntriples(edges, BASE), out)
    back = read_ntriples(spark, out)
    rows = {
        (r["subject"], r["predicate"], r["object"]) for r in back.collect()
    }
    assert (
        f"{BASE}CHEBI:1",
        f"{BASE}biolink:related_to",
        f"{BASE}NCBITaxon:9606",
    ) in rows
    assert (
        f"{BASE}a%20b",
        f"{BASE}q%22x",
        f"{BASE}brace%7B%7D%7Ccaret%5Etick%60slash%5C",
    ) in rows
    assert len(rows) == 2
    assert not back.filter("object_is_literal").count()


def test_nodes_labels_and_types(spark, tmp_path):
    nodes = spark.createDataFrame(
        [
            ("CHEBI:1", 'name "quoted" \\ back', "biolink:ChemicalEntity"),
            ("X:2", None, "biolink:Gene"),  # label skipped, type kept
            ("Y:3", "plain", None),  # type skipped, label kept
        ],
        "id string, name string, category string",
    )
    out = os.path.join(tmp_path, "nodes_nt")
    write_ntriples(nodes_to_ntriples(nodes, BASE), out, single_file=True)
    back = read_ntriples(spark, out)
    rows = {
        (r["subject"], r["predicate"], r["object"], r["object_is_literal"])
        for r in back.collect()
    }
    assert (
        f"{BASE}CHEBI:1",
        RDFS_LABEL,
        'name \\"quoted\\" \\\\ back',
        True,
    ) in rows
    assert (f"{BASE}X:2", RDF_TYPE, f"{BASE}biolink:Gene", False) in rows
    assert (f"{BASE}Y:3", RDFS_LABEL, "plain", True) in rows
    assert len(rows) == 4  # CHEBI label+type, X type, Y label


def test_malformed_lines_dropped(spark, tmp_path):
    p = os.path.join(tmp_path, "bad.nt")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.nt"), "w") as f:
        f.write("# comment\n")
        f.write("not a triple\n")
        f.write(f"<{BASE}s> <{BASE}p> <{BASE}o> .\n")
        f.write(f'<{BASE}s> <{BASE}p> "lit with \\" inside" .\n')
    got = read_ntriples(spark, p).collect()
    assert len(got) == 2
    lit = [r for r in got if r["object_is_literal"]][0]
    assert lit["object"] == 'lit with \\" inside'


def _py_iri(s: str) -> str:
    out = s.replace("%", "%25")
    for ch in ' <>"{}|^`\\':
        out = out.replace(ch, f"%{ord(ch):02X}")
    return BASE + out


def test_adversarial_roundtrip(spark, tmp_path):
    # every printable ASCII char, multi-escape pileups, unicode
    weird = [
        "".join(chr(c) for c in range(0x20, 0x7F)),
        '\\\\"\\"%25 %20<>{}|^`',
        "ünïcode-ĸg:ノード",
        "%",
        " leading and trailing ",
    ]
    edges = spark.createDataFrame(
        [(w, "p:x", w) for w in weird],
        "subject string, predicate string, object string",
    )
    out = os.path.join(tmp_path, "adv_nt")
    write_ntriples(edges_to_ntriples(edges, BASE), out, single_file=True)
    back = read_ntriples(spark, out)
    got = {(r["subject"], r["object"]) for r in back.collect()}
    want = {(_py_iri(w), _py_iri(w)) for w in weird}
    assert got == want
