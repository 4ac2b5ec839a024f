"""QM9 dataset pieces.

Mirrors the shapes of the reference's `qm9.py` (SDF via rdkit, atom/bond
featurization `:200-275`) and `distance.py` (normalized 3D edge
distances): x = 11 float columns led by a 5-way atom-type one-hot, pos =
3D coordinates, edge_attr = 4-way bond one-hot, y = 19 targets with the
reference's eV/unit conversion vector (`run_qm9.py:26-31`). rdkit is not
in this image, so `synthetic_qm9` generates QM9-shaped molecules
deterministically; real gdb9.sdf parsing can slot in behind the same
record type when rdkit is available.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from escgnn_tpu.data.container import GraphData
from escgnn_tpu.data.molecules import _molecule_skeleton

HAR2EV = 27.2113825435
KCALMOL2EV = 0.04336414

# per-target unit conversion applied to reported MAEs (reference
# run_qm9.py:26-31, matching PyG's QM9 `conversion`)
QM9_CONVERSION = np.asarray(
    [
        1.0, 1.0, HAR2EV, HAR2EV, HAR2EV, 1.0, HAR2EV, HAR2EV, HAR2EV,
        HAR2EV, HAR2EV, 1.0, KCALMOL2EV, KCALMOL2EV, KCALMOL2EV,
        KCALMOL2EV, 1.0, 1.0, 1.0,
    ],
    np.float64,
)


def synthetic_qm9(num_graphs: int = 1000, seed: int = 0) -> list[GraphData]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_graphs):
        n = int(rng.integers(8, 20))
        ei = _molecule_skeleton(rng, n)
        ntype = rng.integers(0, 5, n).astype(np.int32)
        onehot = np.eye(5, dtype=np.float32)[ntype]
        hyb = rng.random((n, 6)).astype(np.float32)
        x = np.concatenate([onehot, hyb], axis=1)  # (n, 11)
        pos = rng.normal(scale=1.5, size=(n, 3)).astype(np.float32)
        bond = np.eye(4, dtype=np.float32)[
            rng.integers(0, 4, ei.shape[1])
        ]
        deg = np.bincount(ei[1], minlength=n)
        y = np.empty(19, np.float32)
        for t in range(19):
            y[t] = (
                0.3 * n
                + 0.05 * t * float(deg.mean())
                + float((ntype == (t % 5)).sum())
                + 0.1 * float(np.linalg.norm(pos - pos.mean(0)))
            )
        out.append(
            GraphData(
                num_nodes=n,
                edge_index=ei,
                x=x,
                edge_attr=bond,
                pos=pos,
                y=y,
                extras={"node_type": ntype.astype(np.int64)},
            )
        )
    return out


def append_distance_edge_attr(g: GraphData, norm: bool = True) -> GraphData:
    """Append the per-edge 3D distance (normalized by the graph max when
    `norm`, reference `distance.py` Distance(norm=True)) as one extra
    edge_attr column. Applied AFTER the ESC transform, so self loops get
    distance 0 and the enc_* arrays ride along unchanged."""
    pos = np.asarray(g.pos, np.float32)
    ei = np.asarray(g.edge_index)
    d = np.linalg.norm(pos[ei[1]] - pos[ei[0]], axis=1)
    if norm and d.size and d.max() > 0:
        d = d / d.max()
    ea = np.asarray(g.edge_attr, np.float32)
    if ea.ndim == 1:
        ea = ea[:, None]
    return dataclasses.replace(
        g, edge_attr=np.concatenate([ea, d[:, None].astype(np.float32)], 1)
    )


# ---------------------------------------------------------------------------
# Real gdb9.sdf ingestion (no rdkit in this image — a direct V2000
# molblock parser; reference `qm9.py:200-275` builds the same record via
# rdkit). Feature parity notes:
#   * x = [one-hot(H,C,N,O,F) (5) || atomic_number, acceptor, donor,
#     aromatic, sp, sp2, sp3, num_hs] (13) — the reference's
#     one_hot_atom layout. acceptor/donor and the sp hybridization
#     flags come from rdkit's ChemicalFeatures factory and are NOT
#     derivable from the molblock; they are 0 here (the reference also
#     zero-initializes donor/acceptor before the factory pass).
#     aromatic comes from SDF bond type 4; num_hs counts explicit
#     neighboring H atoms (gdb9.sdf stores hydrogens explicitly, which
#     is what GetTotalNumHs(includeNeighbors=True) measures there).
#   * edge_attr = one-hot over {single, double, triple, aromatic},
#     both directions per bond, coalesced in (row, col) order.
#   * y: 19 targets from gdb9.sdf.csv in PyG's order (columns after
#     mol_id, rotational constants A/B/C moved to the end).
# ---------------------------------------------------------------------------

QM9_TYPES = {"H": 0, "C": 1, "N": 2, "O": 3, "F": 4}
ATOMIC_NUM = {"H": 1, "C": 6, "N": 7, "O": 8, "F": 9}


def parse_sdf_v2000(text: str):
    """Parse an SDF (concatenated V2000 molblocks separated by $$$$).

    Returns a list of records (name, elements, pos (n,3), bonds
    [(i, j, type)]) with 0-based atom indices and SDF bond types
    (1=single, 2=double, 3=triple, 4=aromatic)."""
    records = []
    for block in text.split("$$$$"):
        lines = [l for l in block.split("\n")]
        while lines and not lines[0].strip():
            lines = lines[1:]
        if len(lines) < 4:
            continue
        name = lines[0].strip()
        counts = lines[3]
        na, nb = int(counts[0:3]), int(counts[3:6])
        elements, pos = [], []
        for l in lines[4:4 + na]:
            parts = l.split()
            pos.append([float(parts[0]), float(parts[1]), float(parts[2])])
            elements.append(parts[3])
        bonds = []
        for l in lines[4 + na:4 + na + nb]:
            # fixed-width fields (atom indices may run together >999)
            i, j, t = int(l[0:3]), int(l[3:6]), int(l[6:9])
            bonds.append((i - 1, j - 1, t))
        records.append((name, elements, np.asarray(pos, np.float32), bonds))
    return records


def load_qm9_sdf(sdf_path: str, csv_path: str) -> list[GraphData]:
    """Real QM9 from gdb9.sdf + gdb9.sdf.csv (see block comment)."""
    with open(sdf_path) as f:
        records = parse_sdf_v2000(f.read())
    targets = {}
    with open(csv_path) as f:
        header = f.readline()
        ncol = len(header.strip().split(","))
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < ncol:
                continue
            vals = np.asarray([float(v) for v in parts[1:20]], np.float32)
            # PyG order: move rotational constants A/B/C to the end
            targets[parts[0]] = np.concatenate([vals[3:], vals[:3]])

    out = []
    for name, elements, pos, bonds in records:
        n = len(elements)
        type_idx = np.asarray([QM9_TYPES[e] for e in elements], np.int32)
        onehot = np.eye(5, dtype=np.float32)[type_idx]
        atomic = np.asarray([ATOMIC_NUM[e] for e in elements], np.float32)
        aromatic = np.zeros(n, np.float32)
        num_hs = np.zeros(n, np.float32)
        row, col, btype = [], [], []
        for i, j, t in bonds:
            if t == 4:
                aromatic[i] = aromatic[j] = 1.0
            if elements[i] == "H":
                num_hs[j] += 1.0
            if elements[j] == "H":
                num_hs[i] += 1.0
            row += [i, j]
            col += [j, i]
            btype += 2 * [min(t, 4) - 1]  # SDF 1..4 -> 0..3
        ei = np.stack([np.asarray(row), np.asarray(col)]).astype(np.int32)
        ea = np.eye(4, dtype=np.float32)[np.asarray(btype, np.int32)]
        # coalesce in (row, col) order, matching the reference
        order = np.lexsort((ei[1], ei[0]))
        ei, ea = ei[:, order], ea[order]
        zeros = np.zeros(n, np.float32)
        x = np.concatenate(
            [
                onehot,
                np.stack(
                    [atomic, zeros, zeros, aromatic, zeros, zeros, zeros,
                     num_hs],
                    axis=1,
                ),
            ],
            axis=1,
        )  # (n, 13)
        y = targets.get(name)
        if y is None:
            continue
        out.append(
            GraphData(
                num_nodes=n,
                edge_index=ei,
                x=x,
                edge_attr=ea,
                pos=pos,
                y=y,
                extras={"node_type": type_idx.astype(np.int64)},
            )
        )
    return out


def qm9_splits(
    data_dir: str, num_graphs: int = 1000, seed: int = 0
) -> tuple[list, bool]:
    """Real QM9 when `<data_dir>/qm9/raw/gdb9.sdf` (+ `.sdf.csv`) exists;
    otherwise `synthetic_qm9`. Returns (graphs, is_real); the driver
    applies its own shuffled 10/10/80 split (reference
    run_qm9.py:292-309)."""
    import os

    sdf = os.path.join(data_dir, "qm9", "raw", "gdb9.sdf")
    csv = sdf + ".csv"
    if os.path.exists(sdf) and os.path.exists(csv):
        return load_qm9_sdf(sdf, csv), True
    return synthetic_qm9(num_graphs=num_graphs, seed=seed), False
