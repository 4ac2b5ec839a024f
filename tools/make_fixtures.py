#!/usr/bin/env python
"""Regenerate the committed real-format ingestion fixtures under
tests/fixtures/: a ZINC DGL-schema pickle, a QM9 gdb9-style SDF (+
target csv), and an OGB graph-property raw directory. The fixtures are
tiny hand-designed molecules whose expected tensors are asserted
value-by-value in tests/test_real_ingestion.py — so the real-format
parsing branches of data/molecules.py and data/qm9.py execute in the
suite even though the full datasets (and rdkit / the ogb package) are
absent from this image.

Deterministic: running this script always writes identical bytes
(pickle protocol pinned, gzip mtime pinned).
"""

from __future__ import annotations

import gzip
import os
import pickle

import numpy as np

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def make_zinc():
    """(train, val, test) lists of {'x': one-hot, 'A': (4, n, n),
    'y': targets} — the reference dataset_zinc.py wrap2data schema."""

    def mol(types, bonds, y):
        n = len(types)
        x = np.eye(28, dtype=np.float32)[np.asarray(types)]
        A = np.zeros((4, n, n), np.float32)
        for i, j, t in bonds:
            A[t, i, j] = A[t, j, i] = 1.0
        return {"x": x, "A": A, "y": np.asarray(y, np.float32)}

    train = [
        # path 0-1-2: single bond then double bond
        mol([0, 1, 2], [(0, 1, 1), (1, 2, 2)], [1.5, 2.5]),
        # triangle of single bonds
        mol([3, 3, 4], [(0, 1, 1), (1, 2, 1), (0, 2, 1)], [0.25]),
        # 4-node star
        mol([5, 6, 7, 8],
            [(0, 1, 1), (0, 2, 2), (0, 3, 3)], [-1.0, 4.0]),
    ]
    val = [mol([9, 10], [(0, 1, 3)], [0.125])]
    test = [mol([11, 12, 13],
                [(0, 1, 2), (1, 2, 2)], [7.0, -0.5])]
    with open(os.path.join(FIX, "zinc_mini", "ZINC.pkl"), "wb") as f:
        pickle.dump((train, val, test), f, protocol=4)


def make_qm9():
    """Two-molecule gdb9-style SDF + target csv (PyG column layout)."""

    def molblock(name, atoms, bonds):
        lines = [name, "  fixture", ""]
        lines.append(f"{len(atoms):3d}{len(bonds):3d}  0  0  0  0  0  0  "
                     f"0  0999 V2000")
        for (x, y, z, el) in atoms:
            lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {el:<3s} 0  0  0  "
                         f"0  0  0  0  0  0  0  0  0")
        for (i, j, t) in bonds:
            lines.append(f"{i:3d}{j:3d}{t:3d}  0")
        lines.append("M  END")
        lines.append("$$$$")
        return "\n".join(lines)

    # methane: C at origin, 4 H
    m1 = molblock(
        "gdb_1",
        [(0.0, 0.0, 0.0, "C"),
         (0.0, 0.0, 1.09, "H"),
         (1.03, 0.0, -0.36, "H"),
         (-0.51, -0.89, -0.36, "H"),
         (-0.51, 0.89, -0.36, "H")],
        [(1, 2, 1), (1, 3, 1), (1, 4, 1), (1, 5, 1)],
    )
    # CO2: O=C=O
    m2 = molblock(
        "gdb_2",
        [(-1.16, 0.0, 0.0, "O"),
         (0.0, 0.0, 0.0, "C"),
         (1.16, 0.0, 0.0, "O")],
        [(1, 2, 2), (2, 3, 2)],
    )
    # benzene, KEKULIZED (alternating 1/2 ring bonds) + 6 H — exercises
    # the ring-topology aromaticity perception (gdb9.sdf never stores
    # SDF bond type 4)
    import math

    benz_atoms = []
    benz_bonds = []
    for k in range(6):
        a = math.radians(60 * k)
        benz_atoms.append(
            (round(1.39 * math.cos(a), 4), round(1.39 * math.sin(a), 4),
             0.0, "C")
        )
    for k in range(6):
        a = math.radians(60 * k)
        benz_atoms.append(
            (round(2.47 * math.cos(a), 4), round(2.47 * math.sin(a), 4),
             0.0, "H")
        )
    for k in range(6):
        benz_bonds.append((k + 1, (k + 1) % 6 + 1, 1 + (k % 2)))
        benz_bonds.append((k + 1, k + 7, 1))
    m3 = molblock("gdb_3", benz_atoms, benz_bonds)
    # propyne: HC#C-CH3 — exercises sp inference from the triple bond
    m4 = molblock(
        "gdb_4",
        [(0.0, 0.0, 0.0, "C"),
         (1.20, 0.0, 0.0, "C"),
         (2.66, 0.0, 0.0, "C"),
         (-1.06, 0.0, 0.0, "H"),
         (3.02, 1.02, 0.0, "H"),
         (3.02, -0.51, 0.88, "H"),
         (3.02, -0.51, -0.88, "H")],
        [(1, 2, 3), (2, 3, 1), (1, 4, 1), (3, 5, 1), (3, 6, 1),
         (3, 7, 1)],
    )
    # furan, kekulized: O1-C2=C3-C4=C5-O1 with 4 H — the 5-ring
    # lone-pair-donor aromatic pattern
    m5 = molblock(
        "gdb_5",
        [(0.0, 1.16, 0.0, "O"),
         (1.09, 0.35, 0.0, "C"),
         (0.68, -0.96, 0.0, "C"),
         (-0.68, -0.96, 0.0, "C"),
         (-1.09, 0.35, 0.0, "C"),
         (2.09, 0.75, 0.0, "H"),
         (1.33, -1.82, 0.0, "H"),
         (-1.33, -1.82, 0.0, "H"),
         (-2.09, 0.75, 0.0, "H")],
        [(1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2), (5, 1, 1),
         (2, 6, 1), (3, 7, 1), (4, 8, 1), (5, 9, 1)],
    )
    # an "uncharacterized" molecule that the skip list excludes
    m6 = molblock(
        "gdb_6",
        [(0.0, 0.0, 0.0, "N"), (0.0, 0.0, 1.01, "H"),
         (0.95, 0.0, -0.34, "H"), (-0.48, -0.83, -0.34, "H")],
        [(1, 2, 1), (1, 3, 1), (1, 4, 1)],
    )
    root = os.path.join(FIX, "qm9_root", "qm9", "raw")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "gdb9.sdf"), "w") as f:
        f.write("\n".join([m1, m2, m3, m4, m5, m6]) + "\n")
    header = ("mol_id,A,B,C,mu,alpha,homo,lumo,gap,r2,zpve,u0,u298,h298,"
              "g298,cv,u0_atom,u298_atom,h298_atom,g298_atom")
    rows = [
        "gdb_1," + ",".join(str(float(v)) for v in range(1, 20)),
        "gdb_2," + ",".join(str(float(v) * 0.5) for v in range(1, 20)),
        "gdb_3," + ",".join(str(float(v) * 0.1) for v in range(1, 20)),
        "gdb_4," + ",".join(str(float(v) * 0.2) for v in range(1, 20)),
        "gdb_5," + ",".join(str(float(v) * 0.3) for v in range(1, 20)),
        "gdb_6," + ",".join(str(float(v) * 0.4) for v in range(1, 20)),
    ]
    with open(os.path.join(root, "gdb9.sdf.csv"), "w") as f:
        f.write(header + "\n" + "\n".join(rows) + "\n")
    # PyG-style skip list: header lines then "   <idx>  ..." rows;
    # excludes gdb_6 (record index 5 -> 1-based 6)
    with open(os.path.join(root, "uncharacterized.txt"), "w") as f:
        f.write("\n".join(
            ["uncharacterized molecules", "=" * 20,
             "   6   gdb_6   failed"]
        ) + "\n")


def make_ogb():
    """Three-graph OGB graph-property raw directory (molhiv-style 9-col
    node / 3-col edge integer features, scaffold split)."""
    root = os.path.join(FIX, "ogb_root", "ogbg_mini")
    raw = os.path.join(root, "raw")
    split = os.path.join(root, "split", "scaffold")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)

    def write_gz(path, rows):
        # pin mtime=0 so bytes are reproducible
        with open(path, "wb") as fo:
            with gzip.GzipFile(fileobj=fo, mode="wb", mtime=0) as f:
                for r in rows:
                    f.write((",".join(str(v) for v in r) + "\n").encode())

    # graph 0: 2-node single edge pair; graph 1: triangle; graph 2: 2-path
    n_nodes = [2, 3, 3]
    edges = [
        [(0, 1), (1, 0)],
        [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)],
        [(0, 1), (1, 0), (1, 2), (2, 1)],
    ]
    n_edges = [len(e) for e in edges]
    node_feat = []
    for g, nn in enumerate(n_nodes):
        for v in range(nn):
            node_feat.append([5 + g, v % 4, 1, 0, 2, 0, 1, 0, 0])
    edge_feat = []
    for g, es in enumerate(edges):
        for k in range(len(es)):
            edge_feat.append([k % 4, g % 6, k % 2])
    write_gz(os.path.join(raw, "num-node-list.csv.gz"),
             [[v] for v in n_nodes])
    write_gz(os.path.join(raw, "num-edge-list.csv.gz"),
             [[v] for v in n_edges])
    write_gz(os.path.join(raw, "edge.csv.gz"),
             [list(e) for es in edges for e in es])
    write_gz(os.path.join(raw, "node-feat.csv.gz"), node_feat)
    write_gz(os.path.join(raw, "edge-feat.csv.gz"), edge_feat)
    write_gz(os.path.join(raw, "graph-label.csv.gz"), [[0], [1], [0]])
    write_gz(os.path.join(split, "train.csv.gz"), [[0]])
    write_gz(os.path.join(split, "valid.csv.gz"), [[1]])
    write_gz(os.path.join(split, "test.csv.gz"), [[2]])


if __name__ == "__main__":
    os.makedirs(os.path.join(FIX, "zinc_mini"), exist_ok=True)
    make_zinc()
    make_qm9()
    make_ogb()
    print("fixtures written to", FIX)
