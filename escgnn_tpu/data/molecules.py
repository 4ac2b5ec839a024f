"""Synthetic molecule-shaped datasets (ZINC / OGB stand-ins).

The reference's ZINC loader unpickles a DGL artifact (`dataset_zinc.py`)
and the OGB drivers download from ogb servers (`run_ogb_mol.py:23`);
neither artifact is distributable here (zero egress). These generators
produce deterministic graphs with the same shapes and statistics —
ZINC-12k: ~23 heavy atoms, 28 node types, 4 bond types, scalar
regression target; ogbg-mol*: 9-column atom / 3-column bond categorical
features, binary multi-task labels with NaN holes — so every driver,
cache, and model path is exercisable end to end and learnable (targets
are deterministic structural functions, not noise).
"""

from __future__ import annotations

import numpy as np

from escgnn_tpu.data.container import GraphData

# OGB categorical vocab sizes (ogb.utils.features get_atom/bond_feature_dims)
_ATOM_DIMS = (119, 4, 12, 12, 10, 6, 6, 2, 2)
_BOND_DIMS = (5, 6, 2)


def _molecule_skeleton(rng: np.random.Generator, n: int):
    """Connected sparse graph: a random path plus a few short chords
    (ring bonds) — ZINC-like degree statistics."""
    order = rng.permutation(n)
    src = [order[:-1]]
    dst = [order[1:]]
    extra = max(2, n // 6)
    c1 = rng.integers(0, n, extra)
    c2 = (c1 + rng.integers(2, 5, extra)) % n
    keep = c1 != c2
    src.append(c1[keep])
    dst.append(c2[keep])
    a = np.concatenate(src)
    b = np.concatenate(dst)
    # dedupe undirected pairs
    key = np.minimum(a, b) * n + np.maximum(a, b)
    _, uniq = np.unique(key, return_index=True)
    a, b = a[uniq], b[uniq]
    ei = np.stack(
        [np.concatenate([a, b]), np.concatenate([b, a])]
    ).astype(np.int32)
    return ei


def _num_triangles(n: int, ei: np.ndarray) -> int:
    A = np.zeros((n, n), np.float64)
    A[ei[0], ei[1]] = 1.0
    return int(round(np.trace(A @ A @ A) / 6.0))


def synthetic_zinc(num_graphs: int = 2000, seed: int = 0) -> list[GraphData]:
    """ZINC-shaped graphs: x (n, 1) int node types in [0, 28), edge_attr
    (E,) int bond types in [1, 4), y (1,) float32 — a deterministic
    structural pseudo-"solubility" (so models can actually learn it)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_graphs):
        n = int(rng.integers(18, 30))
        ei = _molecule_skeleton(rng, n)
        x = rng.integers(0, 28, n).astype(np.int32)[:, None]
        ea = rng.integers(1, 4, ei.shape[1]).astype(np.int32)
        tri = _num_triangles(n, ei)
        deg = np.bincount(ei[1], minlength=n)
        y = (
            0.05 * n
            - 0.4 * tri
            + 0.1 * float((x[:, 0] % 5).mean())
            - 0.2 * float(deg.std())
        )
        out.append(
            GraphData(
                num_nodes=n,
                edge_index=ei,
                x=x,
                edge_attr=ea,
                y=np.asarray([y], np.float32),
            )
        )
    return out


def load_zinc_pickle(path: str) -> dict:
    """Parse the reference's ZINC artifact (`dataset_zinc.py:45-73`): a
    pickle of (train, val, test) lists of dicts with 'x' (node one-hots),
    'A' (bond_types, n, n) stacked adjacency, 'y' targets. Returns
    {'train': [...], 'val': [...], 'test': [...]} of GraphData with the
    reference's exact conversion: edges where A sums to 1 over bond
    types, edge type = argmax over the bond axis, y = last target."""
    import pickle

    with open(path, "rb") as f:
        raw_all = pickle.load(f)
    names = ("train", "val", "test")
    out = {}
    for name, raw in zip(names, raw_all):
        graphs = []
        for d in raw:
            x = np.asarray(d["x"])
            A = np.asarray(d["A"])
            y = np.asarray(d["y"], np.float32).reshape(-1)[-1:]
            begin, end = np.where(A.sum(axis=0) == 1.0)
            edge_attr = np.argmax(A[:, begin, end].T, axis=-1).astype(
                np.int32
            )
            if x.ndim == 2 and x.shape[1] > 1:
                x = np.argmax(x, axis=1)
            x = x.reshape(-1, 1).astype(np.int32)
            graphs.append(
                GraphData(
                    num_nodes=int(x.shape[0]),
                    edge_index=np.stack([begin, end]).astype(np.int32),
                    x=x,
                    edge_attr=edge_attr,
                    y=y,
                )
            )
        out[name] = graphs
    return out


def zinc_splits(
    data_dir: str, num_graphs: int = 2000, seed: int = 0
) -> tuple[dict, bool]:
    """Real ZINC splits when the reference artifact (`<data_dir>/ZINC.pkl`
    or `<data_dir>/zinc/raw/ZINC.pkl`) exists; otherwise a deterministic
    80/10/10 split of `synthetic_zinc`. Returns (splits, is_real)."""
    import os

    for cand in (
        os.path.join(data_dir, "ZINC.pkl"),
        os.path.join(data_dir, "zinc", "raw", "ZINC.pkl"),
    ):
        if os.path.exists(cand):
            return load_zinc_pickle(cand), True
    raw = synthetic_zinc(num_graphs=num_graphs, seed=seed)
    n_tr, n_val = int(0.8 * len(raw)), int(0.1 * len(raw))
    return {
        "train": raw[:n_tr],
        "val": raw[n_tr:n_tr + n_val],
        "test": raw[n_tr + n_val:],
    }, False


def synthetic_ogb_mol(
    num_graphs: int = 2000,
    seed: int = 0,
    num_tasks: int = 1,
    nan_frac: float = 0.0,
    label_kind: str = "parity",
) -> list[GraphData]:
    """ogbg-mol*-shaped graphs: x (n, 9) int atom features within the OGB
    vocab bounds, edge_attr (E, 3) int bond features, y (num_tasks,)
    float32 in {0, 1} with a `nan_frac` fraction of NaN holes (the
    unlabeled entries run_ogb_mol masks out of the BCE,
    reference `run_ogb_mol.py:65-72`).

    `label_kind` selects the stand-in label function:
      * "parity" (default, the historical stand-in): a node-feature /
        triangle parity — measured near-unlearnable for GNNs at this
        scale (it requires exact parity over ~20 nodes), so rows
        trained on it evidence "the path trains", not "the model
        learns".
      * "tri": triangle count above the dataset median — squarely
        inside the ESC encoding's provable counting power
        (arXiv:2303.10576), so a capable model should reach high
        ROC-AUC and a broken one won't.  Used for the round-5
        learns-to-quality rows of the molhiv-shaped zoo."""
    rng = np.random.default_rng(seed)
    out = []
    tris = []
    for _ in range(num_graphs):
        n = int(rng.integers(12, 28))
        ei = _molecule_skeleton(rng, n)
        x = np.stack(
            [rng.integers(0, min(d, 16), n) for d in _ATOM_DIMS], axis=1
        ).astype(np.int32)
        ea = np.stack(
            [rng.integers(0, d, ei.shape[1]) for d in _BOND_DIMS], axis=1
        ).astype(np.int32)
        tri = _num_triangles(n, ei)
        base = (tri % 2) ^ (n % 2)
        y = np.empty(num_tasks, np.float32)
        for t in range(num_tasks):
            y[t] = float((base + t + int(x[:, 0].sum())) % 2)
        if nan_frac > 0:
            holes = rng.random(num_tasks) < nan_frac
            y[holes] = np.nan
        out.append(
            GraphData(
                num_nodes=n, edge_index=ei, x=x, edge_attr=ea, y=y,
            )
        )
        tris.append(tri)
    if label_kind == "tri":
        med = float(np.median(tris))
        for g, tri in zip(out, tris):
            lab = float(tri > med)
            keep_nan = np.isnan(g.y)
            g.y[:] = lab
            g.y[keep_nan] = np.nan
    elif label_kind != "parity":
        raise ValueError(f"unknown label_kind {label_kind!r}")
    return out


def synthetic_aqsol(num_graphs: int = 2000, seed: int = 0) -> list[GraphData]:
    """AQSOL-shaped graphs (reference GraphGPS
    `loader/dataset/aqsol_molecules.py`): ZINC-style int atom/bond types
    (65 atom, 5 bond classes) with a structural pseudo-solubility target
    — the aqueous-solubility regression row of the GPS zoo."""
    rng = np.random.default_rng(seed + 7)
    out = []
    for _ in range(num_graphs):
        n = int(rng.integers(10, 30))
        ei = _molecule_skeleton(rng, n)
        x = rng.integers(0, 65, n).astype(np.int32)[:, None]
        ea = rng.integers(0, 5, ei.shape[1]).astype(np.int32)
        tri = _num_triangles(n, ei)
        deg = np.bincount(ei[1], minlength=n)
        y = (
            -0.08 * n
            + 0.3 * tri
            - 0.15 * float((x[:, 0] % 7).mean())
            + 0.25 * float(deg.mean())
        )
        out.append(GraphData(
            num_nodes=n, edge_index=ei, x=x,
            edge_attr=ea.astype(np.int32),
            y=np.asarray([y], np.float32),
        ))
    return out


def aqsol_splits(
    data_dir: str, num_graphs: int = 2000, seed: int = 0
) -> tuple[dict, bool]:
    """Real AQSOL splits when `<data_dir>/aqsol/<split>.pickle` artifacts
    exist (the reference's per-split pickles); otherwise a deterministic
    80/10/10 split of `synthetic_aqsol`. Returns (splits, is_real)."""
    import os

    names = {s: os.path.join(data_dir, "aqsol", f"{s}.pickle")
             for s in ("train", "val", "test")}
    if all(os.path.exists(p) for p in names.values()):
        return {s: load_zinc_pickle(p) for s, p in names.items()}, True
    raw = synthetic_aqsol(num_graphs=num_graphs, seed=seed)
    n_tr, n_val = int(0.8 * len(raw)), int(0.1 * len(raw))
    return {
        "train": raw[:n_tr],
        "val": raw[n_tr:n_tr + n_val],
        "test": raw[n_tr + n_val:],
    }, False


def synthetic_ppa(
    num_graphs: int = 2000, seed: int = 0, num_classes: int = 37
) -> list[GraphData]:
    """ogbg-ppa-shaped graphs (reference `run_ogb_mol.py:352`, GraphGPS
    `encoder/ppa_encoder.py`): NO node features (x = zeros -> uniform
    embedding), 7-dim float edge features, one of 37 species classes.
    The class is tied to graph statistics so models can learn it."""
    rng = np.random.default_rng(seed + 11)
    out = []
    for _ in range(num_graphs):
        n = int(rng.integers(15, 40))
        # denser association-network-like topology
        p = rng.uniform(0.12, 0.3)
        upper = np.triu(rng.random((n, n)) < p, k=1)
        order = rng.permutation(n)
        upper[np.minimum(order[:-1], order[1:]),
              np.maximum(order[:-1], order[1:])] = True
        a, b = np.nonzero(upper)
        ei = np.stack([np.concatenate([a, b]), np.concatenate([b, a])]
                      ).astype(np.int32)
        ea = rng.random((ei.shape[1], 7)).astype(np.float32)
        tri = _num_triangles(n, ei)
        cls = int((n // 3 + tri + int(ea.mean() * 10)) % num_classes)
        out.append(GraphData(
            num_nodes=n, edge_index=ei,
            x=np.zeros((n, 1), np.int32),
            edge_attr=ea,
            y=np.asarray([cls], np.int64),
        ))
    return out


def ppa_splits(
    data_dir: str, num_graphs: int = 2000, seed: int = 0
) -> tuple[dict, bool]:
    """ogbg-ppa splits: the real loader needs the `ogb` package (absent
    in this env — same caveat as molhiv/molpcba); the synthetic generator
    exercises the full pipeline. Returns (splits, is_real)."""
    raw = synthetic_ppa(num_graphs=num_graphs, seed=seed)
    n_tr, n_val = int(0.8 * len(raw)), int(0.1 * len(raw))
    return {
        "train": raw[:n_tr],
        "val": raw[n_tr:n_tr + n_val],
        "test": raw[n_tr + n_val:],
    }, False


def load_ogb_graph_dir(root: str) -> dict:
    """Parse an OGB graph-property-prediction dataset directory WITHOUT
    the `ogb` package (absent in this env) — the on-disk raw schema the
    package downloads (reference `dataset_pyg.py:14-120` consumes it via
    PygGraphPropPredDataset):

        <root>/raw/num-node-list.csv.gz   one int per graph
        <root>/raw/num-edge-list.csv.gz   one int per graph
        <root>/raw/edge.csv.gz            src,dst per directed edge row
        <root>/raw/node-feat.csv.gz       one int row per node (optional)
        <root>/raw/edge-feat.csv.gz       one row per edge (optional)
        <root>/raw/graph-label.csv.gz     one row per graph (NaN = unlabeled)
        <root>/split/<scheme>/{train,valid,test}.csv.gz  graph indices

    Edge rows are taken as-is (OGB molecule datasets store both
    directions). Returns {'train': [...], 'val': [...], 'test': [...]}
    of GraphData."""
    import glob
    import gzip
    import os

    def read_csv(name, dtype):
        path = os.path.join(root, "raw", name)
        if not os.path.exists(path):
            return None
        with gzip.open(path, "rt") as f:
            # real multi-task label files (e.g. ogbg-molpcba) encode
            # missing labels as EMPTY csv fields -> NaN (unlabeled)
            rows = [
                [dtype(v) if v else float("nan")
                 for v in line.strip("\n").split(",")]
                for line in f
                if line.strip()
            ]
        return np.asarray(rows)

    n_nodes = read_csv("num-node-list.csv.gz", int)[:, 0]
    n_edges = read_csv("num-edge-list.csv.gz", int)[:, 0]
    edges = read_csv("edge.csv.gz", int)
    node_feat = read_csv("node-feat.csv.gz", float)
    edge_feat = read_csv("edge-feat.csv.gz", float)
    labels = read_csv("graph-label.csv.gz", float)

    graphs = []
    noff = eoff = 0
    for g, (nn, ne) in enumerate(zip(n_nodes, n_edges)):
        ei = edges[eoff:eoff + ne].T.astype(np.int32)
        x = (
            node_feat[noff:noff + nn].astype(np.int32)
            if node_feat is not None
            else np.zeros((nn, 1), np.int32)
        )
        ea = (
            edge_feat[eoff:eoff + ne]
            if edge_feat is not None
            else None
        )
        if ea is not None:
            # integer-valued features (molecule vocab ids) stay ints
            ea = (
                ea.astype(np.int32)
                if np.allclose(ea, np.round(ea))
                else ea.astype(np.float32)
            )
        graphs.append(GraphData(
            num_nodes=int(nn),
            edge_index=ei,
            x=x,
            edge_attr=ea,
            y=labels[g].astype(np.float32),
        ))
        noff += nn
        eoff += ne

    split_dirs = sorted(glob.glob(os.path.join(root, "split", "*")))
    assert split_dirs, f"no split scheme under {root}/split"
    out = {}
    for fname, key in (("train", "train"), ("valid", "val"),
                       ("test", "test")):
        path = os.path.join(split_dirs[0], f"{fname}.csv.gz")
        with gzip.open(path, "rt") as f:
            idx = [int(l.strip()) for l in f if l.strip()]
        out[key] = [graphs[i] for i in idx]
    return out


def synthetic_pcqm4mv2(
    num_graphs: int = 2000, seed: int = 0
) -> list[GraphData]:
    """PCQM4Mv2-shaped graphs (OGB-LSC HOMO-LUMO gap regression,
    reference `master_loader.py:441-525`): OGB atom/bond int features,
    scalar float y. The synthetic target is a smooth structural
    function (triangle count + size + mean degree), so a working
    regression pipeline must drive MAE well below the label std."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_graphs):
        n = int(rng.integers(12, 28))
        ei = _molecule_skeleton(rng, n)
        x = np.stack(
            [rng.integers(0, min(d, 16), n) for d in _ATOM_DIMS], axis=1
        ).astype(np.int32)
        ea = np.stack(
            [rng.integers(0, d, ei.shape[1]) for d in _BOND_DIMS], axis=1
        ).astype(np.int32)
        tri = _num_triangles(n, ei)
        y = np.asarray(
            [0.15 * tri + 0.05 * n + 0.2 * ei.shape[1] / n], np.float32
        )
        out.append(GraphData(
            num_nodes=n, edge_index=ei, x=x, edge_attr=ea, y=y,
        ))
    return out


def pcqm4mv2_splits(
    data_dir: str,
    subset: str = "subset",
    num_graphs: int = 2000,
    seed: int = 0,
) -> tuple[dict, bool]:
    """PCQM4Mv2 splits (reference `preformat_OGB_PCQM4Mv2`,
    master_loader.py:441-525). Real-if-present: an extracted
    `<data_dir>/pcqm4mv2/raw` graph dir in the OGB csv layout loads via
    `load_ogb_graph_dir`; otherwise `synthetic_pcqm4mv2`.

    `subset`: 'subset' trains on 10% of the train split (the
    reference's debugging subset), 'full' on all of it; 'inference'
    mirrors the LSC challenge layout — labeled original-valid as
    "train", unlabeled (NaN-y) test-dev / test-challenge as val/test."""
    import os

    assert subset in ("subset", "full", "inference"), subset
    for cand in (os.path.join(data_dir, "pcqm4mv2"),):
        if os.path.isdir(os.path.join(cand, "raw")):
            return load_ogb_graph_dir(cand), True
    raw = synthetic_pcqm4mv2(num_graphs=num_graphs, seed=seed)
    n_tr, n_val = int(0.8 * len(raw)), int(0.1 * len(raw))
    train, val, test = (
        raw[:n_tr], raw[n_tr:n_tr + n_val], raw[n_tr + n_val:]
    )
    if subset == "subset":
        train = train[: max(1, len(train) // 10)]
    elif subset == "inference":
        for g in val + test:
            g.y = np.full_like(g.y, np.nan)
    return {"train": train, "val": val, "test": test}, False


def ogb_mol_splits(
    data_dir: str,
    dataset: str,
    num_graphs: int = 2000,
    seed: int = 0,
    num_tasks: int = 1,
    nan_frac: float = 0.0,
    label_kind: str = "parity",
) -> tuple[dict, bool]:
    """Real OGB molecule splits when `<data_dir>/<dataset>/raw` exists
    (the package's extracted layout, underscores for dashes); otherwise
    a deterministic 80/10/10 split of `synthetic_ogb_mol`.
    Returns (splits, is_real)."""
    import os

    for cand in (
        os.path.join(data_dir, dataset.replace("-", "_")),
        os.path.join(data_dir, dataset),
    ):
        if os.path.isdir(os.path.join(cand, "raw")):
            splits = load_ogb_graph_dir(cand)
            g0 = next(
                (g for s in splits.values() for g in s if g.y is not None),
                None,
            )
            if g0 is not None:
                width = int(np.asarray(g0.y).reshape(-1).shape[0])
                # fail HERE, not as an opaque broadcast error in the
                # loss, when --num_tasks disagrees with the real labels
                assert width == num_tasks, (
                    f"{dataset}: real label width {width} != requested "
                    f"num_tasks {num_tasks}; pass --num_tasks {width}"
                )
            return splits, True
    raw = synthetic_ogb_mol(
        num_graphs=num_graphs, seed=seed, num_tasks=num_tasks,
        nan_frac=nan_frac, label_kind=label_kind,
    )
    n_tr, n_val = int(0.8 * len(raw)), int(0.1 * len(raw))
    return {
        "train": raw[:n_tr],
        "val": raw[n_tr:n_tr + n_val],
        "test": raw[n_tr + n_val:],
    }, False
