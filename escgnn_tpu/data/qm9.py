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
