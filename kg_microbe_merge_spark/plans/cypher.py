"""Cypher-subset queries over KGX node/edge DataFrames.

The reference exposes its merged graph to Cypher via the optional
kg-chat Neo4j backend (`/root/reference/kg_microbe_merge/run.py:276-381`
— ``import``/``test-query``/``show-schema`` run Cypher like
``MATCH (n) RETURN n LIMIT 10`` against a Neo4j load of the KGX TSVs;
the chat/qna commands wrap an external LLM service, out of scope).
This module implements that LOCAL query capability engine-side: a
Cypher-subset → DataFrame compiler, so a reference user can run their
graph queries without a Neo4j server.

Supported subset (one MATCH, parsed with a small tokenizer — not a full
openCypher grammar):

- ``MATCH (n)``, ``(n:Label)`` — label matches the KGX ``category``
  with or without the ``biolink:`` prefix
- path chains ``(a)-[:TYPE]->(b)-[r:TYPE2]->(c)`` and comma-separated
  patterns; relationship type matches ``predicate`` with/without
  ``biolink:``; ``<-[...]-`` reversed arrows
- variable-length relationships ``-[:TYPE*]->``, ``-[*2]->``,
  ``-[:T*1..3]->``, ``-[:T*2..]->`` (Neo4j bounds grammar; endpoint
  RELATION semantics — see :func:`_var_length_pairs`; unbounded upper
  bounds run the path-doubling transitive closure)
- ``WHERE`` with AND-joined comparisons over ``var.prop``:
  ``= <> < <= > >= CONTAINS``, ``STARTS WITH``, ``IS [NOT] NULL``
- ``RETURN [DISTINCT] items [ORDER BY ...] [LIMIT n]`` where an item is
  ``var`` (expands to the node's id/category/name as ``var_id`` etc.,
  or the relationship's predicate), ``var.prop`` (→ ``var_prop``),
  ``count(*)`` / ``count(var)`` (implicit grouping on the other items),
  each optionally ``AS alias``

Compilation: each relationship pattern is a filtered projection of the
edge table; node variables join the node table ONLY when their label,
WHERE, or RETURN actually needs node columns (id-only variables ride
the edge endpoints for free); everything is plain DataFrame select/
filter/join, so Catalyst pushes label/type constants into the scans and
broadcasts the node side when small. Scale: identical join shape to
``plans/bgp.py`` — bucket the edge table on ``subject`` for co-located
chains.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NODE_RE = re.compile(r"\(\s*(\w*)\s*(?::\s*([\w:.]+)\s*)?\)")
_REL_RE = re.compile(
    r"(<?)-\s*\[\s*(\w*)\s*(?::\s*([\w:.]+)\s*)?"
    r"(?:\s*\*\s*(?P<quant>(?:\d+)?\s*(?:\.\.\s*(?:\d+)?)?))?\s*\]\s*-(>?)"
)
_MATCH_RE = re.compile(
    r"^\s*MATCH\s+(?P<pattern>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"\s+RETURN\s+(?P<distinct>DISTINCT\s+)?(?P<items>.+?)"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COND_RE = re.compile(
    r"^\s*(\w+)\.(\w+)\s*"
    r"(=|<>|<=|>=|<|>|CONTAINS|STARTS\s+WITH|IS\s+NOT\s+NULL|IS\s+NULL)"
    r"\s*(.*?)\s*$",
    re.IGNORECASE,
)
_ITEM_RE = re.compile(
    r"^\s*(?:(?P<cnt>count)\s*\(\s*(?P<cntarg>\*|\w+)\s*\)"
    r"|(?P<var>\w+)(?:\.(?P<prop>\w+))?)"
    r"(?:\s+AS\s+(?P<alias>\w+))?\s*$",
    re.IGNORECASE,
)

_ANON = "_anon"


class CypherError(ValueError):
    """Raised for queries outside the supported subset."""


@dataclass
class _Parsed:
    node_labels: dict[str, str | None] = field(default_factory=dict)
    rels: list[tuple[str, str, str | None, str, tuple[int, int | None] | None]] = field(default_factory=list)
    # (src_var, rel_var, rel_type, dst_var, var_length_bounds)
    where: list[tuple[str, str, str, str]] = field(default_factory=list)
    items: list[dict] = field(default_factory=list)
    distinct: bool = False
    order: str | None = None
    limit: int | None = None


def _strip_lit(raw: str) -> object:
    raw = raw.strip()
    if (raw.startswith("'") and raw.endswith("'")) or (
        raw.startswith('"') and raw.endswith('"')
    ):
        return raw[1:-1]
    try:
        return int(raw)
    except ValueError:
        try:
            return float(raw)
        except ValueError:
            raise CypherError(f"unsupported literal: {raw!r}") from None


def _parse(query: str) -> _Parsed:
    m = _MATCH_RE.match(query.strip())
    if not m:
        raise CypherError(
            "supported shape: MATCH <pattern> [WHERE ...] RETURN "
            "[DISTINCT] ... [ORDER BY ...] [LIMIT n]"
        )
    p = _Parsed()
    anon_n = 0

    for path in _split_top(m.group("pattern"), ","):
        pos = 0
        path = path.strip()
        nm = _NODE_RE.match(path, pos)
        if not nm:
            raise CypherError(f"pattern must start with a node: {path!r}")
        prev = _reg_node(p, nm, anon_n)
        anon_n += prev.startswith(_ANON)
        pos = nm.end()
        while pos < len(path):
            rm = _REL_RE.match(path, pos)
            if not rm:
                raise CypherError(f"expected -[...]-> at: {path[pos:]!r}")
            back, rel_var, rel_type, quant, fwd = rm.groups()
            if bool(back) == bool(fwd):
                raise CypherError("relationship must be directed (-> or <-)")
            pos = rm.end()
            nm = _NODE_RE.match(path, pos)
            if not nm:
                raise CypherError(f"expected node after relationship: {path[pos:]!r}")
            cur = _reg_node(p, nm, anon_n)
            anon_n += cur.startswith(_ANON)
            pos = nm.end()
            src, dst = (prev, cur) if fwd else (cur, prev)
            bounds = _parse_quant(quant) if quant is not None else None
            if bounds is not None and rel_var:
                raise CypherError(
                    "variable-length relationships cannot bind a "
                    "relationship variable in this subset"
                )
            p.rels.append((src, rel_var or "", rel_type, dst, bounds))
            prev = cur

    if m.group("where"):
        for cond in _split_top(m.group("where"), " AND "):
            cm = _COND_RE.match(cond)
            if not cm:
                raise CypherError(f"unsupported WHERE condition: {cond!r}")
            var, prop, op, rhs = cm.groups()
            p.where.append((var, prop, re.sub(r"\s+", " ", op.upper()), rhs))

    for item in _split_top(m.group("items"), ","):
        im = _ITEM_RE.match(item)
        if not im:
            raise CypherError(f"unsupported RETURN item: {item!r}")
        p.items.append(im.groupdict())
    p.distinct = bool(m.group("distinct"))
    p.order = m.group("order")
    p.limit = int(m.group("limit")) if m.group("limit") else None
    return p


def _parse_quant(text: str) -> tuple[int, int | None]:
    """Parse the bounds of a ``*`` variable-length quantifier:
    ``""`` → (1, None), ``"3"`` → (3, 3), ``"1..3"`` → (1, 3),
    ``"..3"`` → (1, 3), ``"2.."`` → (2, None). Neo4j's path-length
    grammar, with ``*`` meaning 1..unbounded exactly as there."""
    text = text.replace(" ", "")
    if not text:
        return (1, None)
    if ".." not in text:
        n = int(text)
        return (n, n)
    lo_s, hi_s = text.split("..", 1)
    lo = int(lo_s) if lo_s else 1
    hi = int(hi_s) if hi_s else None
    if hi is not None and hi < lo:
        raise CypherError(f"variable-length bounds out of order: *{text}")
    return (lo, hi)


def _reg_node(p: _Parsed, nm: re.Match, anon_n: int) -> str:
    var = nm.group(1) or f"{_ANON}{anon_n}"
    label = nm.group(2)
    if var in p.node_labels and label and p.node_labels[var] not in (None, label):
        raise CypherError(f"conflicting labels for {var}")
    if label or var not in p.node_labels:
        p.node_labels[var] = label or p.node_labels.get(var)
    return var


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside quotes/brackets (case-insensitive for
    word separators like ' AND ')."""
    out, depth, buf, i = [], 0, [], 0
    n, seplen = len(s), len(sep)
    quote = None
    while i < n:
        c = s[i]
        if quote:
            buf.append(c)
            if c == quote:
                quote = None
            i += 1
            continue
        if c in "'\"":
            quote = c
            buf.append(c)
            i += 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if depth == 0 and s[i : i + seplen].upper() == sep.upper():
            out.append("".join(buf))
            buf = []
            i += seplen
            continue
        buf.append(c)
        i += 1
    out.append("".join(buf))
    return [x for x in (x.strip() for x in out) if x]


def _label_filter(col: F.Column, label: str) -> F.Column:
    """Label/type match with or without the biolink: prefix."""
    if ":" in label:
        return col == label
    return (col == label) | (col == f"biolink:{label}")


def _var_length_pairs(
    edges: DataFrame, rel_type: str | None, lo: int, hi: int | None
) -> DataFrame:
    """Endpoint-pair relation for a variable-length pattern
    ``-[:TYPE*lo..hi]->`` — distinct ``(s, o)`` pairs connected by a
    directed path of length in [lo, hi] over edges of the given type.

    Subset semantics (documented lite deviation, matching the SPARQL
    property-path family in plans/bgp.py): Neo4j enumerates PATHS
    (bag, relationship-unique per path); this engine returns the
    distinct endpoint RELATION — the answer set of "which pairs are
    connected", which is what the pattern join consumes. Bounded hops
    compile to ``hi`` chained equi-joins with a distinct per length
    (frontier reuse, not re-derivation); an unbounded upper bound goes
    through :func:`..operators.closure.transitive_closure` (path
    doubling — ⌈log₂ depth⌉ rounds, output-size guard), prefixed by
    ``lo-1`` fixed steps when ``lo > 1`` since paths of length ≥ lo
    are exactly R^(lo-1) ∘ R⁺.
    """
    r = edges.select(
        F.col("subject").alias("s"),
        F.col("predicate").alias("p"),
        F.col("object").alias("o"),
    )
    if rel_type:
        r = r.filter(_label_filter(F.col("p"), rel_type))
    r = r.select("s", "o").distinct()

    def compose(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.alias("l")
            .join(b.alias("r"), F.col("l.o") == F.col("r.s"))
            .select(F.col("l.s").alias("s"), F.col("r.o").alias("o"))
            .distinct()
        )

    if hi is not None and hi > 16:
        raise CypherError(
            f"variable-length upper bound {hi} > 16: use an unbounded "
            "* (transitive closure) instead of a long join chain"
        )
    out: DataFrame | None = None
    if hi is None:
        from ..operators.closure import transitive_closure

        plus = transitive_closure(r, "s", "o").select(
            F.col("src").alias("s"), F.col("dst").alias("o")
        )
        if lo <= 1:
            out = plus
        else:
            pre = r
            for _ in range(lo - 2):
                pre = compose(pre, r)
            out = compose(pre, plus)
    else:
        cur = r
        for length in range(1, hi + 1):
            if length > 1:
                cur = compose(cur, r)
            if length >= lo:
                out = cur if out is None else out.unionByName(cur).distinct()
    if lo == 0:
        ids = (
            edges.select(F.col("subject").alias("s"))
            .unionByName(edges.select(F.col("object").alias("s")))
            .distinct()
        )
        identity = ids.select("s", F.col("s").alias("o"))
        out = identity if out is None else out.unionByName(identity).distinct()
    return out


def cypher_query(
    nodes: DataFrame, edges: DataFrame, query: str
) -> DataFrame:
    """Run a Cypher-subset query against KGX node/edge DataFrames."""
    p = _parse(query)

    # which node vars need actual node columns (vs riding edge endpoints)
    needs_nodes: set[str] = {
        v for v, lbl in p.node_labels.items() if lbl is not None
    }
    rel_vars = {rv for _, rv, _, _, _ in p.rels if rv}
    for var, prop, _op, _rhs in p.where:
        if var not in rel_vars and var not in p.node_labels:
            raise CypherError(f"unknown variable in WHERE: {var!r}")
        if var not in rel_vars and prop != "id":
            # an id predicate rides the edge endpoint; anything else
            # needs the node table
            needs_nodes.add(var)
    node_props: dict[str, set[str]] = {}
    for it in p.items:
        if it["cnt"]:
            continue
        var, prop = it["var"], it["prop"]
        if var in rel_vars:
            continue
        if var not in p.node_labels:
            raise CypherError(f"unknown variable in RETURN: {var!r}")
        if prop is None:
            node_props.setdefault(var, set()).update(
                c for c in ("id", "category", "name") if c in nodes.columns
            )
            needs_nodes.add(var)
        elif prop != "id":
            node_props.setdefault(var, set()).add(prop)
            needs_nodes.add(var)
    for var, prop, _op, _rhs in p.where:
        if var not in rel_vars and prop != "id":
            node_props.setdefault(var, set()).add(prop)

    # --- assemble the graph pattern ---
    out: DataFrame | None = None
    bound: set[str] = set()
    if p.rels:
        for src, rel_var, rel_type, dst, quant in p.rels:
            if quant is not None:
                t = _var_length_pairs(edges, rel_type, *quant).select(
                    F.col("s").alias(f"_id_{src}"),
                    F.col("o").alias(f"_id_{dst}"),
                )
            else:
                t = edges.select(
                    F.col("subject").alias(f"_id_{src}"),
                    F.col("predicate").alias(
                        f"_rel_{rel_var}" if rel_var else "_rel__drop"
                    ),
                    F.col("object").alias(f"_id_{dst}"),
                )
                if rel_type:
                    t = t.filter(
                        _label_filter(
                            F.col(f"_rel_{rel_var}" if rel_var else "_rel__drop"),
                            rel_type,
                        )
                    )
                if not rel_var:
                    t = t.drop("_rel__drop")
            if out is None:
                out = t
            else:
                shared = [c for c in t.columns if c in out.columns]
                out = out.join(t, on=shared) if shared else out.crossJoin(t)
            bound.update({src, dst})
    else:
        only = next(iter(p.node_labels))
        if len(p.node_labels) != 1:
            raise CypherError("node-only MATCH supports a single node")
        out = nodes.select(F.col("id").alias(f"_id_{only}"))
        bound.add(only)
        needs_nodes.add(only)
        node_props.setdefault(only, set())

    unknown = set(p.node_labels) - bound
    if unknown:
        raise CypherError(f"variables not bound by any pattern: {unknown}")

    # --- join node table for vars that need node columns ---
    for var in sorted(needs_nodes):
        lbl = p.node_labels.get(var)
        want = set(node_props.get(var, ()))
        side_cols = [F.col("id").alias(f"_id_{var}")] + [
            F.col(c).alias(f"_p_{var}_{c}") for c in sorted(want) if c != "id"
        ]
        side = nodes
        if lbl:
            side = side.filter(_label_filter(F.col("category"), lbl))
        missing = [c for c in want if c != "id" and c not in nodes.columns]
        if missing:
            raise CypherError(f"unknown node properties: {missing}")
        out = out.join(side.select(*side_cols), on=f"_id_{var}")

    # --- WHERE ---
    for var, prop, op, rhs in p.where:
        if var in rel_vars:
            if prop not in ("type", "predicate"):
                raise CypherError(
                    f"relationship supports .type/.predicate, got .{prop}"
                )
            col = F.col(f"_rel_{var}")
        elif prop == "id":
            col = F.col(f"_id_{var}")
        else:
            col = F.col(f"_p_{var}_{prop}")
        if op == "IS NULL":
            cond = col.isNull()
        elif op == "IS NOT NULL":
            cond = col.isNotNull()
        else:
            lit = F.lit(_strip_lit(rhs))
            cond = {
                "=": col == lit,
                "<>": col != lit,
                "<": col < lit,
                "<=": col <= lit,
                ">": col > lit,
                ">=": col >= lit,
                "CONTAINS": col.contains(lit),
                "STARTS WITH": col.startswith(lit),
            }[op]
        out = out.filter(cond)

    # --- RETURN ---
    proj: list[F.Column] = []
    group_cols: list[str] = []
    aggs: list[F.Column] = []
    for it in p.items:
        alias = it["alias"]
        if it["cnt"]:
            arg = it["cntarg"]
            name = alias or ("count" if arg == "*" else f"count_{arg}")
            col = (
                F.count("*")
                if arg == "*"
                else F.count(F.col(f"_id_{arg}"))
            )
            aggs.append(col.alias(name))
        elif it["prop"]:
            var, prop = it["var"], it["prop"]
            name = alias or f"{var}_{prop}"
            if var in rel_vars:
                proj.append(F.col(f"_rel_{var}").alias(name))
            elif prop == "id":
                proj.append(F.col(f"_id_{var}").alias(name))
            else:
                proj.append(F.col(f"_p_{var}_{prop}").alias(name))
            group_cols.append(name)
        else:
            var = it["var"]
            if var in rel_vars:
                name = alias or f"{var}_predicate"
                proj.append(F.col(f"_rel_{var}").alias(name))
                group_cols.append(name)
            else:
                base = alias or var
                proj.append(F.col(f"_id_{var}").alias(f"{base}_id"))
                group_cols.append(f"{base}_id")
                for c in sorted(node_props.get(var, ())):
                    if c != "id":
                        proj.append(F.col(f"_p_{var}_{c}").alias(f"{base}_{c}"))
                        group_cols.append(f"{base}_{c}")

    if aggs:
        # materialize the grouping aliases first; keep the _id_ columns
        # that count(var) arguments reference
        keep_ids = [
            F.col(f"_id_{it['cntarg']}")
            for it in p.items
            if it["cnt"] and it["cntarg"] != "*"
        ]
        out = out.select(*proj, *keep_ids) if (proj or keep_ids) else out
        out = (
            out.groupBy(*group_cols).agg(*aggs)
            if group_cols
            else out.agg(*aggs)
        )
    else:
        out = out.select(*proj)
    if p.distinct:
        out = out.distinct()
    if p.order:
        sorts = []
        for part in _split_top(p.order, ","):
            toks = part.split()
            desc = len(toks) > 1 and toks[-1].upper() == "DESC"
            name = toks[0].replace(".", "_")
            sorts.append(F.col(name).desc() if desc else F.col(name).asc())
        out = out.orderBy(*sorts)
    if p.limit is not None:
        out = out.limit(p.limit)
    return out
