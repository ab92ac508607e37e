"""Driver-side file utilities — parity with the reference's
utils/file_utils.py (S5 archive handling, S7 path discovery; behavior
only, re-implemented):

- untar/tar of KG source directories (file_utils.py:12-45)
- discovery of (nodes, edges) TSV pairs under transform directories,
  whole-directory or named-subset (file_utils.py:48-162)

These run on the driver (metadata-scale work); at production scale path
discovery is replaced by catalog/partition listing, but the TSV-dir
layout is what the reference's users have on disk today.
"""

from __future__ import annotations

import tarfile
from pathlib import Path


def unzip_files_in_dir(dir_path: str) -> list[str]:
    """Extract every ``*.tar.gz`` under ``dir_path`` in place; returns
    the extracted archive names."""
    out = []
    for arc in sorted(Path(dir_path).glob("*.tar.gz")):
        with tarfile.open(arc, "r:gz") as tf:
            # filter="data" rejects absolute paths / '..' members — the
            # CLI --untar flag runs on user-supplied directories, so a
            # crafted archive must not write outside the target.
            tf.extractall(arc.parent, filter="data")
        out.append(str(arc))
    return out


def tarball_files_in_dir(dir_path: str, output_tar: str) -> str:
    """Package every regular file under ``dir_path`` (recursively) into
    one ``.tar.gz``, arcnames relative to ``dir_path``.

    Recursion matters: the default distributed sink writes each merged
    table as a part-file DIRECTORY (merged_kg_nodes/part-*.csv), so a
    flat listing would silently ship a tarball with the entire graph
    missing. The in-progress output tar and hidden bookkeeping files
    (Spark ``.crc`` shadows) are excluded."""
    out = Path(output_tar).resolve()
    with tarfile.open(output_tar, "w:gz") as tf:
        for f in sorted(Path(dir_path).rglob("*")):
            if (
                f.is_file()
                and f.resolve() != out
                and not f.name.startswith(".")
            ):
                tf.add(f, arcname=str(f.relative_to(dir_path)))
    return output_tar


def collect_paths_from_directory(
    transform_dir: str,
    nodes_suffix: str = "_nodes.tsv",
    edges_suffix: str = "_edges.tsv",
) -> tuple[list[str], list[str]]:
    """All (nodes, edges) TSVs under every subdirectory of
    ``transform_dir`` (recursive; sorted for determinism)."""
    root = Path(transform_dir)
    nodes = sorted(str(p) for p in root.rglob(f"*{nodes_suffix}"))
    edges = sorted(str(p) for p in root.rglob(f"*{edges_suffix}"))
    return nodes, edges


def collect_subset_kg_paths(
    transform_dir: str,
    subset_names: list[str],
    nodes_suffix: str = "_nodes.tsv",
    edges_suffix: str = "_edges.tsv",
) -> tuple[list[str], list[str]]:
    """(nodes, edges) TSVs restricted to subdirectories whose name
    contains any of ``subset_names`` (the reference's named-subset
    merge products)."""
    root = Path(transform_dir)
    nodes: list[str] = []
    edges: list[str] = []
    for sub in sorted(p for p in root.iterdir() if p.is_dir()):
        if not any(name in sub.name for name in subset_names):
            continue
        nodes.extend(sorted(str(p) for p in sub.rglob(f"*{nodes_suffix}")))
        edges.extend(sorted(str(p) for p in sub.rglob(f"*{edges_suffix}")))
    return nodes, edges


def discover_priority_sources(
    nodes_paths: list[str], ontology_marker: str = "ontologies"
) -> list[str]:
    """Priority-source discovery (reference merge.py:81-92 behavior):
    for each nodes file under an ``ontologies`` directory, read the
    first data row's ``provided_by`` value."""
    import csv

    prio: list[str] = []
    for path in nodes_paths:
        if ontology_marker not in Path(path).parts:
            continue
        with open(path, newline="") as f:
            reader = csv.DictReader(f, delimiter="\t")
            row = next(reader, None)
            if row and row.get("provided_by"):
                prio.append(row["provided_by"])
    return prio
