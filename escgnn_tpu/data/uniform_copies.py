"""Uniform per-copy block layout for the copy-based family (NGNN/I²GNN).

The copy-based transforms (reference `utils.py:create_subgraphs`,
`utils_edge_I2.py:132-256`) tile each graph into many SMALL subgraph
copies; the batched union is block-diagonal at the COPY level — copy c's
edges only touch copy c's nodes. The ragged union layout forces every
per-layer aggregation through a global XLA scatter-add, which profiles
~15x off the HBM roofline (results_archive/profile_i2gnn/).

This module re-lays each union graph out so every copy occupies an
identical (n_c, e_c) block: copy c's nodes sit at rows
[c*n_c, (c+1)*n_c), its edges at slots [c*e_c, (c+1)*e_c). That unlocks

  * message passing as per-copy one-hot einsums on the MXU (the same
    `_dense_local_aggregate` path the flagship uses per-graph), and
  * node -> copy pooling as a masked reshape reduction (no scatter).

Padding is per-COPY, not per-union — copies are small and low-variance
(h-hop ego-nets), so the padded row count stays far below the "square
the union" strawman. Intra-graph padding rows/edges are marked by the
`node_valid` / `edge_valid` extras, which `pad_and_batch` ANDs into
`node_mask` / `edge_mask`.

Use: `n_c, e_c = copy_block_sizes(graphs)` over the featurized dataset,
then `uniformize_copies(g, n_c, e_c)` per graph, then
`BatchSpec.copy_uniform(...)` + `pad_and_batch` as usual.
"""

from __future__ import annotations

import numpy as np

from escgnn_tpu.data.container import GraphData


def _copy_level_key(g: GraphData) -> str:
    ex = g.extras or {}
    if "node_to_subgraph2" in ex:
        return "node_to_subgraph2"
    assert "node_to_subgraph" in ex, "not a copy-based featurized graph"
    return "node_to_subgraph"


def copy_block_sizes(graphs, round_nodes: int = 1, round_edges: int = 1):
    """Dataset-wide (n_c, e_c): max nodes / edges of any single copy."""
    n_c = e_c = 1
    for g in graphs:
        lvl = np.asarray(g.extras[_copy_level_key(g)])
        n_c = max(n_c, int(np.bincount(lvl).max()))
        if g.num_edges:
            ei = np.asarray(g.edge_index)
            e_c = max(e_c, int(np.bincount(lvl[ei[1]]).max()))
    rn = max(1, int(round_nodes))
    re = max(1, int(round_edges))
    return -(-n_c // rn) * rn, -(-e_c // re) * re


def uniformize_copies(g: GraphData, n_c: int, e_c: int) -> GraphData:
    """Re-lay `g`'s copy union into uniform (n_c, e_c) blocks per copy."""
    ex = dict(g.extras or {})
    key = _copy_level_key(g)
    lvl = np.asarray(ex[key], np.int64)
    N = g.num_nodes
    assert lvl.shape[0] == N
    # copies are emitted contiguously by the transforms
    assert np.all(np.diff(lvl) >= 0), "copy ids must be non-decreasing"
    sizes = np.bincount(lvl)
    C = sizes.shape[0]
    assert sizes.max() <= n_c, (int(sizes.max()), n_c)
    starts = np.concatenate([[0], np.cumsum(sizes)])

    # old node id -> new node id (copy block + local offset)
    new_of = lvl * n_c + (np.arange(N) - starts[lvl])
    NN = C * n_c

    def scatter_nodes(a, fill=0):
        a = np.asarray(a)
        out = np.full((NN,) + a.shape[1:], fill, a.dtype)
        out[new_of] = a
        return out

    node_valid = np.zeros(NN, bool)
    node_valid[new_of] = True

    # --- edges: remap endpoints, group per copy, pad each copy to e_c ---
    E = g.num_edges
    ei = np.asarray(g.edge_index)
    if E:
        ecopy = lvl[ei[1]]
        assert np.all(ecopy == lvl[ei[0]]), "edge crosses copies"
        s_new, d_new = new_of[ei[0]], new_of[ei[1]]
        perm = np.lexsort((s_new, d_new))  # receiver groups encode the copy
        s_new, d_new, ecopy = s_new[perm], d_new[perm], ecopy[perm]
        e_sizes = np.bincount(ecopy, minlength=C)
    else:
        perm = np.zeros(0, np.int64)
        s_new = d_new = np.zeros(0, np.int64)
        e_sizes = np.zeros(C, np.int64)
    assert e_sizes.max(initial=0) <= e_c, (int(e_sizes.max()), e_c)
    e_starts = np.concatenate([[0], np.cumsum(e_sizes)])
    # slot of edge j (sorted order): its copy's block + position within
    pos = np.arange(len(s_new)) - e_starts[ecopy] if E else np.zeros(0, int)
    slot = (ecopy * e_c + pos).astype(np.int64) if E else np.zeros(0, int)
    EE = C * e_c
    # padding edges park on their copy's trailing node slot — receivers
    # stay non-decreasing within each copy block
    park = np.repeat(np.arange(C, dtype=np.int64), e_c) * n_c + n_c - 1
    src = park.copy()
    dst = park.copy()
    src[slot] = s_new
    dst[slot] = d_new
    edge_valid = np.zeros(EE, bool)
    edge_valid[slot] = True

    def scatter_edges(a):
        a = np.asarray(a)[perm]
        out = np.zeros((EE,) + a.shape[1:], a.dtype)
        out[slot] = a
        return out

    # --- rebuild extras ---
    out_ex: dict = {}
    for k, v in ex.items():
        va = np.asarray(v) if not np.isscalar(v) else v
        if k == key:
            filled = np.repeat(np.arange(C, dtype=lvl.dtype), n_c)
            out_ex[k] = filled  # padding rows carry their copy id
        elif k == "center_idx":
            out_ex[k] = new_of[np.asarray(v, np.int64)]
        elif (not np.isscalar(v) and va.ndim >= 1 and va.shape[0] == N):
            out_ex[k] = scatter_nodes(va)
        elif (not np.isscalar(v) and va.ndim >= 1 and E
              and va.shape[0] == E):
            out_ex[k] = scatter_edges(va)
        else:
            out_ex[k] = v
    out_ex["node_valid"] = node_valid
    out_ex["edge_valid"] = edge_valid
    # ride _batch_named_extras' "num_" skip rule; consumed by BatchSpec
    out_ex["num_copy_nodes"] = int(n_c)
    out_ex["num_copy_edges"] = int(e_c)

    x_new = scatter_nodes(g.x) if g.x is not None else None
    ea_new = scatter_edges(g.edge_attr) if g.edge_attr is not None else None
    return GraphData(
        num_nodes=NN,
        edge_index=np.stack([src, dst]).astype(np.int32),
        x=x_new,
        edge_attr=ea_new,
        y=g.y,
        pos=scatter_nodes(g.pos) if g.pos is not None else None,
        extras=out_ex,
    )


def uniformize_dataset(graphs, round_nodes: int = 1, round_edges: int = 1):
    """Uniformize a featurized copy-based dataset in one call."""
    n_c, e_c = copy_block_sizes(graphs, round_nodes, round_edges)
    return [uniformize_copies(g, n_c, e_c) for g in graphs]
