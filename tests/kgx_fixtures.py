"""In-code ports of the reference merge-test fixtures.

Semantics preserved from /root/reference/tests/data/ (test_nodes_{1,2}.tsv,
test_edges_{1,2}.tsv and the three golden outputs) — the oracle facts the
engine must reproduce: priority-source name win, MAX-name fallback when
the duplicate's name is empty, sorted-distinct pipe-joins, uuid edge-id
drop, distinct-(s,p,o) and provenance-preserving edge union, output sort.
"""

from __future__ import annotations

NODE_COLUMNS = [
    "id", "category", "name", "description", "xref", "provided_by",
    "synonym", "iri", "object", "predicate", "relation", "same_as",
    "subject", "subsets",
]

# priority list as in reference tests/test_duckdb_utils.py:31
PRIORITY_SOURCES = [
    "ncbitaxon_removed_subset.json",
    "chebi.json",
    "uniprot.json",
]


def _node(id, category=None, name=None, description=None, xref=None,
          provided_by=None, synonym=None, iri=None, subsets=None):
    return {
        "id": id, "category": category, "name": name,
        "description": description, "xref": xref,
        "provided_by": provided_by, "synonym": synonym, "iri": iri,
        "object": None, "predicate": None, "relation": None,
        "same_as": None, "subject": None, "subsets": subsets,
    }


NODES_FILE_1 = [
    _node("NCBITaxon:1933880", "biolink:OrganismTaxon",
          "Glutamicibacter halophytocola"),
    _node("UniprotKB:A0A5B8I2N0", "biolink:Enzyme", "Kynureninase ",
          provided_by="uniprot_genome_features"),
    _node("EC:3.7.1.3", "biolink:Enzyme", "kynureninase"),
    # non-priority source supplies a name; file 2's priority source must win
    _node("Proteomes:UP000320717", "biolink:Genome",
          "Proteomes:UP000320717", provided_by="uniprot_genome_features"),
    _node("CHEBI:597326", "biolink:ChemicalSubstance",
          "pyridoxal 5'-phosphate(2-)", synonym="pyridoxal 5'-phosphate"),
]

NODES_FILE_2 = [
    _node("NCBITaxon:1933880", "biolink:OrganismTaxon",
          "Glutamicibacter halophytocola",
          xref="GC_ID:11|PMID:28056223",
          provided_by="ncbitaxon_removed_subset.json",
          iri="http://purl.obolibrary.org/obo/NCBITaxon_1933880"),
    _node("UniprotKB:A0A5B8I2N0", "biolink:Enzyme", "Kynureninase ",
          provided_by="uniprot_genome_features"),
    # empty (null) name from a priority source → MAX fallback must win
    _node("EC:3.7.1.3", "biolink:Enzyme", None, provided_by="chebi.json"),
    _node("Proteomes:UP000320717", "biolink:Genome",
          "Demethylmenaquinone methyltransferase", provided_by="uniprot.json"),
    _node("CHEBI:597326", "biolink:ChemicalEntity",
          "pyridoxal 5'-phosphate(2-)",
          description="The dianion resulting from the removal of two protons "
                      "from the phosphate group of pyridoxal 5'-phosphate.",
          xref="PMID:19144516", provided_by="chebi.json",
          synonym="pyridoxal 5'-phosphate dianion",
          iri="http://purl.obolibrary.org/obo/CHEBI_597326",
          subsets="3_STAR"),
]

# expected rows after nodes_merge, sorted by id
EXPECTED_NODES_MERGED = [
    _node("CHEBI:597326", "biolink:ChemicalEntity|biolink:ChemicalSubstance",
          "pyridoxal 5'-phosphate(2-)",
          description="The dianion resulting from the removal of two protons "
                      "from the phosphate group of pyridoxal 5'-phosphate.",
          xref="PMID:19144516", provided_by="chebi.json",
          synonym="pyridoxal 5'-phosphate|pyridoxal 5'-phosphate dianion",
          iri="http://purl.obolibrary.org/obo/CHEBI_597326",
          subsets="3_STAR"),
    _node("EC:3.7.1.3", "biolink:Enzyme", "kynureninase",
          provided_by="chebi.json"),
    _node("NCBITaxon:1933880", "biolink:OrganismTaxon",
          "Glutamicibacter halophytocola",
          xref="GC_ID:11|PMID:28056223",
          provided_by="ncbitaxon_removed_subset.json",
          iri="http://purl.obolibrary.org/obo/NCBITaxon_1933880"),
    _node("Proteomes:UP000320717", "biolink:Genome",
          "Demethylmenaquinone methyltransferase",
          provided_by="uniprot.json|uniprot_genome_features"),
    _node("UniprotKB:A0A5B8I2N0", "biolink:Enzyme", "Kynureninase ",
          provided_by="uniprot_genome_features"),
]

EDGE_COLUMNS = ["subject", "predicate", "object", "relation", "knowledge_source"]

EDGES_FILE_1 = [
    ("RHEA:10000", "biolink:has_participant", "CHEBI:15377", "RO:0000057", "RheaViaPyObo"),
    ("RHEA:10000", "biolink:has_participant", "CHEBI:16459", "RO:0000057", "RheaViaPyObo"),
    ("CHEBI:16134", "biolink:related_to", "CHEBI:28938",
     "OBO:chebi#is_conjugate_base_of", "chebi.json"),
    ("NCBITaxon:1000003", "biolink:subclass_of", "NCBITaxon:2637762",
     "rdfs:subClassOf", "test.json"),
]

# second file carries a uuid id column that must be dropped
EDGES_FILE_2_WITH_ID = [
    ("urn:uuid:0001", "NCBITaxon:10", "biolink:subclass_of", "NCBITaxon:1706371",
     "rdfs:subClassOf", "ncbitaxon_removed_subset.json"),
    ("urn:uuid:0002", "NCBITaxon:100", "biolink:subclass_of", "NCBITaxon:99",
     "rdfs:subClassOf", "ncbitaxon_removed_subset.json"),
    # duplicate (s,p,o) of file 1 with a different knowledge_source →
    # distinct output keeps one; provenance output pipe-joins sources
    ("urn:uuid:0003", "NCBITaxon:1000003", "biolink:subclass_of",
     "NCBITaxon:2637762", "rdfs:subClassOf", "ncbitaxon_removed_subset.json"),
]

EXPECTED_EDGES_DISTINCT = sorted(
    {(s, p, o) for (s, p, o, *_rest) in EDGES_FILE_1}
    | {(s, p, o) for (_id, s, p, o, *_rest) in EDGES_FILE_2_WITH_ID}
)

EXPECTED_EDGES_PROVENANCE = [
    ("CHEBI:16134", "biolink:related_to", "CHEBI:28938",
     "OBO:chebi#is_conjugate_base_of", "chebi.json"),
    ("NCBITaxon:10", "biolink:subclass_of", "NCBITaxon:1706371",
     "rdfs:subClassOf", "ncbitaxon_removed_subset.json"),
    ("NCBITaxon:100", "biolink:subclass_of", "NCBITaxon:99",
     "rdfs:subClassOf", "ncbitaxon_removed_subset.json"),
    ("NCBITaxon:1000003", "biolink:subclass_of", "NCBITaxon:2637762",
     "rdfs:subClassOf", "ncbitaxon_removed_subset.json|test.json"),
    ("RHEA:10000", "biolink:has_participant", "CHEBI:15377",
     "RO:0000057", "RheaViaPyObo"),
    ("RHEA:10000", "biolink:has_participant", "CHEBI:16459",
     "RO:0000057", "RheaViaPyObo"),
]
