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


# ---------------------------------------------------------------------------
# two-size bucketed block layout (round 5)
# ---------------------------------------------------------------------------


def choose_bucket_sizes(graphs) -> tuple:
    """(n_s, e_s): the small-bucket block shape minimizing total padded
    edge slots when copies with <= e_s edges pad to (n_s, e_s) and the
    rest to the dataset-wide (n_c, e_c).

    The round-4 A/B quantified the single-size layout's residual as
    ~1.76-2.1x edge padding (BASELINE.md); on the I2GNN bench set a
    two-size split cuts padded edge slots 2.09x -> 1.39x."""
    n_sizes, e_sizes = [], []
    for g in graphs:
        lvl = np.asarray(g.extras[_copy_level_key(g)])
        cn = np.bincount(lvl)
        ei = np.asarray(g.edge_index)
        ce = np.bincount(lvl[ei[1]], minlength=len(cn)) if g.num_edges \
            else np.zeros(len(cn), np.int64)
        n_sizes += cn.tolist()
        e_sizes += ce.tolist()
    n_sizes = np.asarray(n_sizes)
    e_sizes = np.asarray(e_sizes)
    e_max = int(e_sizes.max())
    best = (np.inf, e_max, int(n_sizes.max()))
    for t in np.unique(e_sizes):
        small = e_sizes <= t
        if not small.any() or small.all():
            continue
        cost = small.sum() * t + (~small).sum() * e_max
        if cost < best[0]:
            best = (cost, int(t), int(n_sizes[small].max()))
    return best[2], best[1]


def bucketize_copy_batch(batch, n_s: int, e_s: int,
                         pad_small: int = 0, pad_large: int = 0,
                         cs_budget: "int | None" = None,
                         cl_budget: "int | None" = None):
    """Re-lay a one-size copy-uniform GraphBatch (HOST numpy arrays)
    into the two-size bucketed layout: copies whose real size fits
    (n_s, e_s) move to a leading SMALL region of (n_s, e_s) blocks, the
    rest to a trailing LARGE region of the original (n_c, e_c) blocks.
    Segment ids are renumbered to the new copy order; every
    node/edge/segment-aligned array moves by gather. `pad_small`/
    `pad_large` grow the region block counts beyond this batch's needs
    (so a pool of shuffled batches shares one compiled shape).

    `cs_budget`/`cl_budget` PIN the region block counts instead (pool
    path: every batch of every membership pool must share one compiled
    shape). A batch with more small copies than `cs_budget` stays
    CORRECT by demotion: the largest overflow small copies are placed
    in the large region (always valid — n_s <= n_c, e_s <= e_c);
    overflowing `cl_budget` raises, the caller sized the budgets.

    Returns a new host GraphBatch with `seg_regions` set (and
    nodes_per_seg/edges_per_seg cleared). Numerically equivalent by
    construction: masks move with their rows, padding edges park on
    their block's trailing slot exactly like `uniformize_copies`."""
    n_c = batch.nodes_per_seg
    e_c = batch.edges_per_seg
    assert n_c is not None and e_c is not None, "need a copy-uniform batch"
    assert n_s <= n_c and e_s <= e_c, ((n_s, e_s), (n_c, e_c))
    nm = np.asarray(batch.node_mask)
    em = np.asarray(batch.edge_mask)
    N, E = nm.shape[0], em.shape[0]
    S = N // n_c
    assert S * n_c == N and S * e_c == E, (N, E, n_c, e_c)
    rn = nm.reshape(S, n_c).sum(1)
    re_ = em.reshape(S, e_c).sum(1)
    seg_mask = (
        np.asarray(batch.segment2_mask) if batch.segment2_mask is not None
        else np.asarray(batch.segment_mask)
    )
    assert seg_mask.shape[0] == S, (seg_mask.shape, S)
    # valid rows/edges must be block prefixes (uniformize_copies layout)
    real = np.flatnonzero(seg_mask)
    small = real[(rn[real] <= n_s) & (re_[real] <= e_s)]
    large = real[(rn[real] > n_s) | (re_[real] > e_s)]
    if cs_budget is not None:
        if len(small) > cs_budget:
            # demote the largest overflow smalls to the large region
            order = np.argsort(re_[small], kind="stable")
            keep, demote = (
                small[order[:cs_budget]], small[order[cs_budget:]]
            )
            small = np.sort(keep)
            large = np.sort(np.concatenate([large, demote]))
        if len(large) > (cl_budget or 0):
            raise ValueError(
                f"cl_budget {cl_budget} < {len(large)} large copies "
                f"(after demotion); size the budgets over all pools"
            )
        cs, cl = int(cs_budget), int(cl_budget)
    else:
        cs = len(small) + pad_small
        cl = len(large) + pad_large
    # new slot of each old real block
    slot = np.full(S, -1, np.int64)
    slot[small] = np.arange(len(small))
    slot[large] = cs + np.arange(len(large))
    NN = cs * n_s + cl * n_c
    EE = cs * e_s + cl * e_c

    def node_offset(s):  # new node row offset of new slot s
        s = np.asarray(s)
        return np.where(s < cs, s * n_s, cs * n_s + (s - cs) * n_c)

    def edge_offset(s):
        s = np.asarray(s)
        return np.where(s < cs, s * e_s, cs * e_s + (s - cs) * e_c)

    # old node row -> new node row (valid rows only)
    old_rows = np.flatnonzero(nm)
    ob = old_rows // n_c  # old block
    ol = old_rows % n_c   # local
    assert np.all(slot[ob] >= 0)
    new_rows = node_offset(slot[ob]) + ol
    node_map = np.full(N, -1, np.int64)
    node_map[old_rows] = new_rows

    old_e = np.flatnonzero(em)
    eb = old_e // e_c
    el = old_e % e_c
    assert np.all(el < np.where(slot[eb] < cs, e_s, e_c)), \
        "valid edges must be block prefixes"
    new_e = edge_offset(slot[eb]) + el

    NG = batch.graph_mask.shape[0]

    def move_nodes(a, fill):
        a = np.asarray(a)
        out = np.full((NN,) + a.shape[1:], fill, a.dtype)
        out[new_rows] = a[old_rows]
        return out

    def move_edges(a, fill):
        a = np.asarray(a)
        out = np.full((EE,) + a.shape[1:], fill, a.dtype)
        out[new_e] = a[old_e]
        return out

    def move_segments(a, fill):
        a = np.asarray(a)
        out = np.full((cs + cl,) + a.shape[1:], fill, a.dtype)
        out[slot[real]] = a[real]
        return out

    # new parking slots: every edge parks on its block's trailing node
    park_small = (np.repeat(np.arange(cs), e_s) * n_s + n_s - 1)
    park_large = (cs * n_s
                  + np.repeat(np.arange(cl), e_c) * n_c + n_c - 1)
    park = np.concatenate([park_small, park_large]).astype(
        np.asarray(batch.senders).dtype
    )
    senders = park.copy()
    receivers = park.copy()
    senders[new_e] = node_map[np.asarray(batch.senders)[old_e]]
    receivers[new_e] = node_map[np.asarray(batch.receivers)[old_e]]

    fields = dict(
        senders=senders,
        receivers=receivers,
        node_mask=move_nodes(nm, False),
        edge_mask=move_edges(em, False),
        graph_mask=np.asarray(batch.graph_mask),
        node_graph=move_nodes(batch.node_graph, NG),
        node_local=move_nodes(
            batch.node_local, int(np.asarray(batch.node_local).max())
        ),
    )
    for name in ("x", "pos", "edge_attr"):
        v = getattr(batch, name)
        if v is not None:
            mv = move_edges if name == "edge_attr" else move_nodes
            fields[name] = mv(v, 0)
    y = batch.y
    if y is not None:
        ya = np.asarray(y)
        if ya.shape[0] == N:
            fields["y"] = move_nodes(ya, 0)
        elif ya.shape[0] == S:
            fields["y"] = move_segments(ya, 0)
        else:
            fields["y"] = ya
    # segment levels: rows permute to the new copy order
    def remap_seg_ids(a):
        # old copy ids -> new slots; padding rows -> out of range
        ns = move_nodes(np.asarray(a).astype(np.int64), -1)
        valid = (ns >= 0) & (ns < S)
        valid &= np.where(valid, slot[np.clip(ns, 0, S - 1)], -1) >= 0
        out = np.full(NN, cs + cl, np.asarray(a).dtype)
        out[valid] = slot[ns[valid]]
        return out

    if batch.node_segment is not None:
        fields["node_segment"] = remap_seg_ids(batch.node_segment)
        fields["segment_graph"] = move_segments(batch.segment_graph, NG)
        fields["segment_mask"] = move_segments(batch.segment_mask, False)
    if batch.node_segment2 is not None:
        fields["node_segment2"] = remap_seg_ids(batch.node_segment2)
        fields["segment2_parent"] = move_segments(
            batch.segment2_parent,
            int(np.asarray(batch.segment2_parent).max()),
        )
        fields["segment2_mask"] = move_segments(batch.segment2_mask, False)
    if batch.center_idx is not None:
        ci = np.asarray(batch.center_idx)
        out = np.full((cs + cl,) + ci.shape[1:], NN - 1, ci.dtype)
        vals = node_map[ci[real]]
        vals[vals < 0] = NN - 1
        out[slot[real]] = vals
        fields["center_idx"] = out
    if batch.node_original is not None:
        fields["node_original"] = move_nodes(
            batch.node_original,
            int(np.asarray(batch.node_original).max()),
        )
        fields["original_mask"] = np.asarray(batch.original_mask)
    extras = None
    if batch.extras:
        extras = {}
        for k, v in batch.extras.items():
            va = np.asarray(v)
            if va.ndim >= 1 and va.shape[0] == N:
                extras[k] = move_nodes(va, 0)
            elif va.ndim >= 1 and va.shape[0] == E:
                extras[k] = move_edges(va, 0)
            elif va.ndim >= 1 and va.shape[0] == S:
                extras[k] = move_segments(va, 0)
            else:
                extras[k] = v
    return batch.replace(
        **fields,
        extras=extras,
        nodes_per_seg=None,
        edges_per_seg=None,
        seg_regions=((cs, n_s, e_s), (cl, n_c, e_c)),
    )


def make_bucket_transform(pre_uniform_graphs, batch_size: int):
    """Bucketed-layout batch transform for POOLED training (driver
    `--copy_layout bucketed`): chooses (n_s, e_s) over the featurized
    (pre-uniformize) dataset and pins region budgets at the worst-case
    batch composition — the top-`batch_size` per-graph small/large copy
    counts — so EVERY shuffled batch of every membership pool fits one
    compiled shape (overflow smalls would demote, but with worst-case
    budgets demotion never triggers).

    Returns (transform, regions) where transform: host copy-uniform
    GraphBatch -> bucketed GraphBatch."""
    n_s, e_s = choose_bucket_sizes(pre_uniform_graphs)
    smalls, larges = [], []
    for g in pre_uniform_graphs:
        lvl = np.asarray(g.extras[_copy_level_key(g)])
        cn = np.bincount(lvl)
        ei = np.asarray(g.edge_index)
        ce = np.bincount(lvl[ei[1]], minlength=len(cn)) if g.num_edges \
            else np.zeros(len(cn), np.int64)
        sm = (cn <= n_s) & (ce <= e_s)
        smalls.append(int(sm.sum()))
        larges.append(int((~sm).sum()))
    bs = int(batch_size)
    cs_b = _round_up(sum(sorted(smalls, reverse=True)[:bs]) + 1, 8)
    cl_b = _round_up(sum(sorted(larges, reverse=True)[:bs]) + 1, 8)

    def transform(batch):
        return bucketize_copy_batch(
            batch, n_s, e_s, cs_budget=cs_b, cl_budget=cl_b
        )

    return transform, ((cs_b, n_s, e_s), (cl_b,))


def _round_up(v: int, m: int) -> int:
    return int(-(-int(v) // m) * m)
