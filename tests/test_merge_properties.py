"""Property-based check of the A3 nodes group-merge against an
independent pure-python model (random duplicate patterns, NULLs, empty
strings, random priority membership) — the golden files pin specific
cases; this pins the semantics everywhere else.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kg_microbe_merge_spark.operators.merge import nodes_merge

IDS = [f"K:{i}" for i in range(6)]
SOURCES = ["prio_a", "prio_b", "other_c", "other_d", None]
VALS = st.one_of(
    st.none(),
    st.sampled_from(["", "alpha", "beta", "Gamma", "zz z", "x|y"]),
)

row_st = st.fixed_dictionaries(
    {
        "id": st.sampled_from(IDS),
        "category": VALS,
        "name": VALS,
        "provided_by": st.sampled_from(SOURCES),
        "xref": VALS,
    }
)


def _model(rows: list[dict], priority: list[str]) -> dict[str, dict]:
    out: dict[str, dict] = {}
    by_id: dict[str, list[dict]] = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    for id_, grp in by_id.items():
        prio_names = [
            r["name"]
            for r in grp
            if r["provided_by"] in priority and r["name"] is not None
        ]
        all_names = [r["name"] for r in grp if r["name"] is not None]
        name = max(prio_names) if prio_names else (max(all_names) if all_names else None)
        rec = {"name": name}
        for c in ("category", "provided_by", "xref"):
            vals = sorted({r[c] for r in grp if r[c] is not None})
            rec[c] = "|".join(vals) if vals else None
        out[id_] = rec
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row_st, min_size=1, max_size=40))
def test_nodes_merge_matches_model(spark, rows):
    priority = ["prio_a", "prio_b"]
    df = spark.createDataFrame(
        [(r["id"], r["category"], r["name"], r["provided_by"], r["xref"]) for r in rows],
        "id string, category string, name string, provided_by string, xref string",
    )
    got = {
        r["id"]: {
            "name": r["name"],
            "category": r["category"],
            "provided_by": r["provided_by"],
            "xref": r["xref"],
        }
        for r in nodes_merge(df, priority).collect()
    }
    assert got == _model(rows, priority)


EDGE_VALS = st.one_of(st.none(), st.sampled_from(["", "r1", "r2", "RO:57", "s|t"]))
edge_row_st = st.fixed_dictionaries(
    {
        "subject": st.sampled_from(["A:1", "A:2", "B:1"]),
        "predicate": st.sampled_from(["p", "q"]),
        "object": st.sampled_from(["X:1", "X:2"]),
        "relation": EDGE_VALS,
        "knowledge_source": EDGE_VALS,
    }
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(edge_row_st, min_size=1, max_size=30))
def test_edges_merge_provenance_matches_model(spark, rows):
    from kg_microbe_merge_spark.operators.merge import edges_merge_provenance

    df = spark.createDataFrame(
        [tuple(r[c] for c in ("subject", "predicate", "object", "relation", "knowledge_source")) for r in rows],
        "subject string, predicate string, object string, relation string, knowledge_source string",
    )
    got = {
        (r["subject"], r["predicate"], r["object"]): (r["relation"], r["knowledge_source"])
        for r in edges_merge_provenance(df).collect()
    }
    model: dict = {}
    for r in rows:
        key = (r["subject"], r["predicate"], r["object"])
        model.setdefault(key, ([], []))
        if r["relation"] is not None:
            model[key][0].append(r["relation"])
        if r["knowledge_source"] is not None:
            model[key][1].append(r["knowledge_source"])
    expected = {
        k: (
            "|".join(sorted(set(v[0]))) if v[0] else None,
            "|".join(sorted(set(v[1]))) if v[1] else None,
        )
        for k, v in model.items()
    }
    assert got == expected
