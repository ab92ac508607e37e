"""Merge-config schema validation (config.py — the LinkML-validation
analogue of the reference's merge_schema.yaml): unknown slots and wrong
shapes are rejected with YAML-path error messages; valid reference-style
documents round-trip."""

from __future__ import annotations

import pytest

from kg_microbe_merge_spark.config import (
    MergeConfigError,
    dump_merge_config,
    load_merge_config,
)

VALID = """
configuration:
  output_directory: data/merged
  checkpoint: "false"
merged_graph:
  name: merged-kg
  source:
    - name: ontologies
      input:
        format: tsv
        filename:
          - a_nodes.tsv
          - a_edges.tsv
  operations:
    - name: kgx.graph_operations.summarize_graph.generate_graph_stats
      args:
        graph_name: merged-kg
        filename: merged_graph_stats.yaml
  destination:
    - format: tsv
      compression: tar.gz
      filename: merged-kg
"""


def _write(tmp_path, text):
    p = tmp_path / "merge.yaml"
    p.write_text(text)
    return str(p)


def test_valid_config_roundtrip(tmp_path):
    cfg = load_merge_config(_write(tmp_path, VALID))
    assert cfg.merged_graph.source[0].input.filename == [
        "a_nodes.tsv", "a_edges.tsv"
    ]
    out = str(tmp_path / "out.yaml")
    dump_merge_config(cfg, out)
    cfg2 = load_merge_config(out)
    assert cfg2.to_dict() == cfg.to_dict()


@pytest.mark.parametrize(
    "mutant, path_hint",
    [
        (VALID.replace("configuration:", "configuraton:"), "top level"),
        (VALID.replace("output_directory:", "output_dir:"), "configuration"),
        (VALID.replace("  source:", "  sources:"), "merged_graph"),
        (VALID.replace("      input:", "      inputs:"), "source[0]"),
        (VALID.replace("        format: tsv\n", "        fmt: tsv\n", 1),
         "input"),
        (VALID.replace("    - name: kgx", "    - nam: kgx"),
         "operations[0]"),
        (VALID.replace("    - format: tsv", "    - fromat: tsv"),
         "destination[0]"),
    ],
)
def test_unknown_slots_rejected_with_path(tmp_path, mutant, path_hint):
    with pytest.raises(MergeConfigError) as e:
        load_merge_config(_write(tmp_path, mutant))
    assert path_hint in str(e.value)


def test_wrong_shape_rejected(tmp_path):
    with pytest.raises(MergeConfigError):
        load_merge_config(
            _write(tmp_path, "merged_graph:\n  source: not-a-list\n")
        )
    with pytest.raises(MergeConfigError):
        load_merge_config(
            _write(tmp_path, "configuration: just-a-string\n")
        )
