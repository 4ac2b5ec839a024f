"""Static-shape batching.

TPU-native replacement of the reference's `Batch.from_data_list` with its
per-key cumsum rules (reference `batch.py:24-149`, `batch_I2.py:88-103`):
graphs are packed into a fixed `BatchSpec` budget (padded arrays +
validity masks) so a single XLA compilation serves every batch of the
dataset. The same index vectors are emitted under new names:

  reference key              batch field            increment rule
  -------------              -----------            --------------
  batch                      node_graph             += num_nodes
  pos_batch                  enc_flat_edge/enc_idx  edge-major layout
  pos_index / pos_enc        enc_* (never shifted)  (batch.py:70-73)
  node_to_subgraph           node_segment           += num_subgraphs
  subgraph_to_graph          segment_graph          += 1
  node_to_subgraph2          node_segment2          += num_subgraphs2
  subgraph2_to_subgraph      segment2_parent        += num_subgraphs
  center_idx                 center_idx             += num_nodes
  node_to_original_node      node_original          += num_original_nodes
  assignment_index_k         kset{k}_assign_*       2-row increments
                                                    (batch.py:107-111)

Edges are re-ordered by destination (receiver) inside every graph so the
per-node aggregation of message passing is a *sorted* segment-sum — the
layout XLA/Pallas stream best on TPU. All edge payloads (attrs, ESC
encoding rows) ride the same permutation.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np

from escgnn_tpu.data.container import GraphBatch, GraphData

# extras consumed into dedicated GraphBatch fields / budgets
_STRUCTURAL_KEYS = frozenset({
    "node_to_subgraph", "num_subgraphs",
    "node_to_subgraph2", "num_subgraphs2", "subgraph2_to_subgraph",
    "center_idx", "node_to_original_node", "num_original_nodes",
    "attn_bias", "orig_adj",
    "assign_2to3", "num_assign_2to3",
    "node_valid", "edge_valid",  # copy-uniform masks, folded in directly
    "pair_index", "pair_label",  # labeled link-prediction pairs
})
_KSET_KEYS = ("iso", "edge_index", "assign", "to_subgraph")

# wire dtypes: the ESC bucket ids (< 1800) and counts (small ints) ship as
# int16 — half the host->device bytes of int32; ops cast on device
_ENC_DTYPE = np.int16


def _round_up(v: int, m: int) -> int:
    return int(-(-int(v) // m) * m)


def _ex(g: GraphData, key: str, default=None):
    return (g.extras or {}).get(key, default)


@dataclasses.dataclass(frozen=True)
class BatchSpec:
    """Static padding budget: one spec => one compiled program.

    `from_graphs` sizes every budget as batch_size x the per-graph
    maximum, so any `batch_size`-subset of the dataset fits (required for
    shuffled epochs). `exact` sizes budgets for one specific batch with
    minimal rounding (used by benchmarks, where padding is wasted work).
    """

    num_graphs: int
    num_nodes: int
    num_edges: int
    # ESC encoding: fixed-width rows (enc_width > 0), optionally
    # deduplicated into num_enc_rows unique rows + an edge->row map, or
    # flat COO entries (num_enc_nnz > 0)
    enc_width: int = 0
    y_is_node_level: bool = False
    num_enc_nnz: int = 0
    num_enc_rows: int = 0
    # >0: compact the bucket universe per batch — enc_idx is remapped to
    # [0, num_enc_buckets) and `enc_bucket_ids` maps back to table rows.
    # The z-emb count-matrix build scales with this instead of the full
    # table height (dataset vocabularies cover a fraction of the 1800
    # buckets). Sized from the DATASET-WIDE distinct-bucket count, so any
    # shuffled batch fits.
    num_enc_buckets: int = 0
    # subgraph-copy budgets
    num_segments: int = 0
    num_segments2: int = 0
    num_original: int = 0
    # dense budgets (attn_bias / PPGN / dense pooling)
    max_nodes_per_graph: int = 0
    max_segments_per_graph: int = 0
    # k-set graph budgets
    num_kset2: int = 0
    num_kset2_edges: int = 0
    num_kset2_assign: int = 0
    num_kset3: int = 0
    num_kset3_edges: int = 0
    num_kset3_assign: int = 0
    num_assign_2to3: int = 0
    # labeled link-prediction pairs (inductive-edge task — the
    # reference's edge_index_labeled/edge_label,
    # GraphGPS/graphgps/head/inductive_edge.py:47)
    num_pairs: int = 0
    # uniform layout: every graph gets an identical (nodes, edges) block —
    # node id g*uniform_nodes + i, edge id g*uniform_edges + k (enables
    # the per-graph dense-einsum message-passing path)
    uniform_nodes: int = 0
    uniform_edges: int = 0
    # uniform per-COPY layout (copy-based family; data/uniform_copies.py):
    # graphs arrive pre-uniformized with every subgraph copy padded to an
    # identical (copy_nodes, copy_edges) block; num_nodes/num_edges are
    # whole multiples so block index == copy segment id batch-wide
    copy_nodes: int = 0
    copy_edges: int = 0

    # -- construction -----------------------------------------------------

    @classmethod
    def from_graphs(
        cls,
        graphs: Sequence[GraphData],
        batch_size: int,
        enc_layout: str = "width",
    ) -> "BatchSpec":
        assert graphs, "need at least one graph to size a BatchSpec"
        assert enc_layout in ("width", "dedup", "flat"), enc_layout
        bs = int(batch_size)
        mx = _per_graph_maxima(graphs)
        if enc_layout == "dedup":
            mx["enc_buckets"] = _distinct_bucket_budget(graphs)
            mx["enc_rows_cap"] = _distinct_row_cap(graphs)
            mx["enc_rows_topk"] = _topk_row_sum(graphs, bs)
        kw = _budgets_from(mx, scale=bs, enc_layout=enc_layout)
        # +1: padding edges park on a dedicated padding node
        kw["num_nodes"] = _round_up(bs * mx["nodes"] + 1, 8)
        kw["num_edges"] = _round_up(bs * mx["edges"], 128)
        return cls(
            num_graphs=bs,
            y_is_node_level=_infer_node_level_y(graphs),
            **kw,
        )

    @classmethod
    def uniform(
        cls,
        graphs: Sequence[GraphData],
        batch_size: int,
        enc_layout: str = "width",
    ) -> "BatchSpec":
        """Per-graph uniform blocks (the dense-einsum message-passing
        layout): every graph is padded to the same (nodes, edges) block.
        On low-variance datasets (molecules) this costs little extra
        padding and turns gather/scatter into batched MXU matmuls.

        `uniform_nodes` reserves one always-padding trailing slot per
        block (max_nodes+1 rounded up) so padding edges can park on it
        without colliding with a real node.
        """
        assert graphs, "need at least one graph to size a BatchSpec"
        assert enc_layout in ("width", "dedup", "flat"), enc_layout
        bs = int(batch_size)
        mx = _per_graph_maxima(graphs)
        if enc_layout == "dedup":
            mx["enc_buckets"] = _distinct_bucket_budget(graphs)
            mx["enc_rows_cap"] = _distinct_row_cap(graphs)
            mx["enc_rows_topk"] = _topk_row_sum(graphs, bs)
        kw = _budgets_from(mx, scale=bs, enc_layout=enc_layout)
        n_u = _round_up(mx["nodes"] + 1, 8)
        e_u = _round_up(mx["edges"], 8)
        kw["num_nodes"] = bs * n_u
        kw["num_edges"] = bs * e_u
        kw["uniform_nodes"] = n_u
        kw["uniform_edges"] = e_u
        return cls(
            num_graphs=bs,
            y_is_node_level=_infer_node_level_y(graphs),
            **kw,
        )

    @classmethod
    def copy_uniform(
        cls,
        graphs: Sequence[GraphData],
        batch_size: int,
        enc_layout: str = "width",
        exact: bool = False,
    ) -> "BatchSpec":
        """Uniform per-COPY blocks for the copy-based family (NGNN/I2GNN).

        `graphs` must be pre-processed by `uniform_copies.uniformize_copies`
        (each copy padded to the dataset-wide (n_c, e_c) block). Budgets
        are whole multiples of the block so the batch reshapes to
        (C, n_c, ...) with block index == copy segment id; the copy
        level's segment budget is pinned to the block count for that
        alignment."""
        assert graphs, "need at least one graph to size a BatchSpec"
        ex0 = graphs[0].extras or {}
        n_c = int(ex0["num_copy_nodes"])
        e_c = int(ex0["num_copy_edges"])
        bs = int(batch_size)
        mx = _per_graph_maxima(graphs)
        if enc_layout == "dedup":
            mx["enc_buckets"] = _distinct_bucket_budget(graphs)
            mx["enc_rows_cap"] = _distinct_row_cap(graphs)
            mx["enc_rows_topk"] = _topk_row_sum(graphs, bs)
        kw = _budgets_from(mx, scale=bs, enc_layout=enc_layout)
        if exact:  # bench path: tight block count for exactly this list
            c_budget = _round_up(
                sum(g.num_nodes // n_c for g in graphs) + 1, 8
            )
        else:
            c_max = max(g.num_nodes // n_c for g in graphs)
            c_budget = _round_up(bs * c_max + 1, 8)
        kw["num_nodes"] = c_budget * n_c
        kw["num_edges"] = c_budget * e_c
        kw["copy_nodes"] = n_c
        kw["copy_edges"] = e_c
        if "node_to_subgraph2" in ex0:
            kw["num_segments2"] = c_budget
        else:
            kw["num_segments"] = c_budget
        return cls(
            num_graphs=bs,
            y_is_node_level=_infer_node_level_y(graphs),
            **kw,
        )

    @classmethod
    def exact(
        cls, graphs: Sequence[GraphData], enc_layout: str = "width"
    ) -> "BatchSpec":
        """Tight budget for exactly this list of graphs (bench path:
        padding drops to rounding slack only)."""
        assert graphs, "need at least one graph to size a BatchSpec"
        mx = _per_graph_maxima(graphs)
        tot = _per_graph_totals(graphs)
        if enc_layout == "dedup" and graphs[0].enc_offsets is not None:
            # exact knows the actual batch: the true CROSS-graph unique
            # count (on molecule batches ~3.4x below the per-graph sum)
            rows = set()
            for g in graphs:
                off = np.asarray(g.enc_offsets)
                for e in range(len(off) - 1):
                    i, c = g.enc_row(e)
                    rows.add(tuple(i.tolist() + c.tolist()))
            tot["enc_rows"] = len(rows)
        if enc_layout == "dedup":
            tot["enc_buckets"] = _distinct_bucket_budget(graphs)
        kw = _budgets_from(tot, scale=1, enc_layout=enc_layout)
        kw["max_nodes_per_graph"] = mx["nodes"]
        kw["max_segments_per_graph"] = mx["segments_per_graph"]
        kw["num_nodes"] = _round_up(tot["nodes"] + 1, 8)
        kw["num_edges"] = _round_up(max(tot["edges"], 1), 128)
        return cls(
            num_graphs=len(graphs),
            y_is_node_level=_infer_node_level_y(graphs),
            **kw,
        )


def _infer_node_level_y(graphs) -> bool:
    g = next((g for g in graphs if g.y is not None), None)
    if g is None:
        return False
    y = np.asarray(g.y)
    return bool(y.ndim >= 1 and y.shape[0] == g.num_nodes and g.num_nodes > 1)


def _graph_stats(g: GraphData) -> dict:
    ex = g.extras or {}
    s = {
        "nodes": g.num_nodes,
        "edges": g.num_edges,
        "enc_w": 0,
        "enc_nnz": 0,
        "segments": int(ex.get("num_subgraphs", 0)),
        "segments2": int(ex.get("num_subgraphs2", 0)),
        "original": int(ex.get("num_original_nodes", 0)),
        "segments_per_graph": int(ex.get("num_subgraphs", 0)),
        "a23": int(ex.get("num_assign_2to3", 0)),
        "pairs": int(np.asarray(ex["pair_index"]).shape[1])
        if "pair_index" in ex else 0,
    }
    if g.enc_offsets is not None:
        nnz = np.diff(np.asarray(g.enc_offsets))
        s["enc_w"] = int(nnz.max()) if nnz.size else 0
        s["enc_nnz"] = int(nnz.sum())
        s["enc_rows"] = len(np.unique(_graph_row_hashes(g)))
    for k in (2, 3):
        if f"num_kset{k}" in ex:
            s[f"kset{k}"] = int(ex[f"num_kset{k}"])
            s[f"kset{k}_edges"] = int(ex[f"kset{k}_edge_index"].shape[1])
            s[f"kset{k}_assign"] = int(ex[f"kset{k}_assign"].shape[1])
    return s


def _reduce_stats(graphs, reduce_fn) -> dict:
    stats = [_graph_stats(g) for g in graphs]
    keys = set().union(*(s.keys() for s in stats))
    return {k: reduce_fn([s.get(k, 0) for s in stats]) for k in keys}


def _per_graph_maxima(graphs) -> dict:
    return _reduce_stats(graphs, max)


def _per_graph_totals(graphs) -> dict:
    out = _reduce_stats(graphs, sum)
    # width is a per-edge property: always the max
    out["enc_w"] = _reduce_stats(graphs, max)["enc_w"]
    out["segments_per_graph"] = 0  # overridden by caller
    return out


def _distinct_row_cap(graphs) -> int:
    """Dataset-wide distinct (idx, cnt) encoding rows: a hard upper bound
    on any batch's unique-row count, usually far below
    batch_size x per-graph max (molecule datasets repeat histograms
    heavily). Used to cap num_enc_rows so the z-emb count-matrix build
    does not run over rows that can never exist.

    Counted via vectorized 63-bit row hashes (a per-edge Python walk took
    ~0.4 s/1500 graphs and scaled linearly). A cross-dataset hash
    collision (~n^2/2^64) would undercount by one; the batcher's
    `len(uniq) <= R` assert still catches any real overflow loudly."""
    seen: set = set()
    for g in graphs:
        h = _graph_row_hashes(g)
        if h is not None:
            seen.update(h.tolist())
    return len(seen)


def _topk_row_sum(graphs, k: int) -> int:
    """Sum of the k largest per-graph unique-row counts: a valid static
    bound on any k-graph batch's unique rows (batch unique <= sum of its
    members' per-graph uniques <= top-k sum) — usually FAR tighter than
    k x max-per-graph, which sized the z-path ~4x too big on ZINC."""
    counts = sorted(
        (
            len(np.unique(h))
            for h in (_graph_row_hashes(g) for g in graphs)
            if h is not None
        ),
        reverse=True,
    )
    return int(sum(counts[:k]))


def _graph_row_hashes(g) -> "np.ndarray | None":
    """63-bit hash per encoding row of one graph — the shared primitive
    behind per-graph unique-row stats and the dataset-wide row cap. Rows
    with equal (idx, cnt) content hash equally regardless of per-graph
    width (zero padding contributes 0; the cnt seeds use a fixed offset
    so they never overlap the idx seeds)."""
    if g.enc_offsets is None:
        return None
    off = np.asarray(g.enc_offsets)
    nnz = np.diff(off)
    n_e = len(nnz)
    if n_e == 0:
        return None
    w = int(nnz.max()) if n_e else 0
    idxm = np.zeros((n_e, w), np.int64)
    cntm = np.zeros((n_e, w), np.int64)
    rows = np.repeat(np.arange(n_e), nnz)
    cols = np.arange(len(np.asarray(g.enc_idx))) - np.repeat(off[:-1], nnz)
    idxm[rows, cols] = np.asarray(g.enc_idx)
    cntm[rows, cols] = np.asarray(g.enc_cnt)
    return idxm @ _HASH_SEED[:w] + cntm @ _HASH_SEED[2048:2048 + w]


def _distinct_bucket_budget(graphs) -> int:
    """Dataset-wide distinct ESC bucket count -> static compaction budget.
    0 disables compaction (the active set wouldn't beat the raw id
    space, so the per-batch remap would only add work)."""
    ids: set = set()
    cap = 0
    for g in graphs:
        if g.enc_idx is None:
            continue
        a = np.asarray(g.enc_idx)
        if a.size == 0:
            continue
        u = np.unique(a)
        ids.update(u.tolist())
        cap = max(cap, int(u[-1]) + 1)
    if not ids:
        return 0
    budget = _round_up(len(ids), 128)
    return budget if budget < _round_up(cap, 128) else 0


def _budgets_from(m: dict, scale: int, enc_layout: str) -> dict:
    kw = dict(
        enc_width=0,
        num_enc_nnz=0,
        num_segments=_round_up(scale * m["segments"], 8)
        if m["segments"] else 0,
        num_segments2=_round_up(scale * m["segments2"], 8)
        if m["segments2"] else 0,
        num_original=_round_up(scale * m["original"], 8)
        if m["original"] else 0,
        max_nodes_per_graph=m["nodes"],
        max_segments_per_graph=m["segments_per_graph"],
        num_assign_2to3=_round_up(scale * m["a23"], 16) if m["a23"] else 0,
        num_pairs=_round_up(scale * m["pairs"], 16)
        if m.get("pairs") else 0,
    )
    kw["num_enc_rows"] = 0
    if m["enc_w"]:
        if enc_layout == "width":
            kw["enc_width"] = _round_up(m["enc_w"], 8)
        elif enc_layout == "dedup":
            kw["enc_width"] = _round_up(m["enc_w"], 8)
            # +1: the all-zero row every padding edge maps to;
            # capped by the dataset-wide distinct-row count (no batch can
            # exceed it, whatever the shuffle)
            rows = scale * m["enc_rows"]
            topk = m.get("enc_rows_topk", 0)
            if topk:
                rows = min(rows, topk)
            cap = m.get("enc_rows_cap", 0)
            if cap:
                rows = min(rows, cap)
            kw["num_enc_rows"] = _round_up(rows + 1, 128)
            kw["num_enc_buckets"] = m.get("enc_buckets", 0)
        else:
            kw["num_enc_nnz"] = _round_up(scale * m["enc_nnz"], 128)
    for k in (2, 3):
        if m.get(f"kset{k}"):
            kw[f"num_kset{k}"] = _round_up(scale * m[f"kset{k}"], 8)
            kw[f"num_kset{k}_edges"] = _round_up(
                scale * m[f"kset{k}_edges"], 16
            )
            kw[f"num_kset{k}_assign"] = _round_up(
                scale * m[f"kset{k}_assign"], 16
            )
        else:
            kw[f"num_kset{k}"] = 0
            kw[f"num_kset{k}_edges"] = 0
            kw[f"num_kset{k}_assign"] = 0
    return kw


# ---------------------------------------------------------------------------
# pad_and_batch
# ---------------------------------------------------------------------------


def _pad_rows(parts, lengths, budget, dtype=None, trailing=(), offsets=None):
    """Per-graph row blocks placed at `offsets` (consecutive when None),
    zero-padded to `budget` rows."""
    ref = next(p for p in parts if p is not None)
    ref = np.asarray(ref)
    out = np.zeros((budget,) + tuple(trailing or ref.shape[1:]),
                   dtype or ref.dtype)
    off = 0
    for i, (p, n) in enumerate(zip(parts, lengths)):
        if offsets is not None:
            off = int(offsets[i])
        if p is not None and n:
            out[off:off + n] = np.asarray(p).reshape((n,) + out.shape[1:])
        if offsets is None:
            off += n
    return out


def pad_and_batch(graphs: Sequence[GraphData], spec: BatchSpec) -> GraphBatch:
    """Pack `graphs` into one `GraphBatch` under `spec`'s budgets.

    Raises if the graphs exceed any budget — a spec sized by
    `BatchSpec.from_graphs` over the full dataset never does.
    """
    G = len(graphs)
    assert 0 < G <= spec.num_graphs, (G, spec.num_graphs)
    n_sizes = [g.num_nodes for g in graphs]
    e_sizes = [g.num_edges for g in graphs]
    tot_n, tot_e = sum(n_sizes), sum(e_sizes)
    uniform = spec.uniform_nodes > 0
    if uniform:
        n_u, e_u = spec.uniform_nodes, spec.uniform_edges
        assert max(n_sizes) < n_u, (max(n_sizes), n_u)
        assert max(e_sizes) <= e_u, (max(e_sizes), e_u)
        node_off = np.arange(G + 1) * n_u
        edge_off = np.arange(G + 1) * e_u
    else:
        assert tot_n < spec.num_nodes, (tot_n, spec.num_nodes)
        assert tot_e <= spec.num_edges, (tot_e, spec.num_edges)
        if spec.copy_nodes:
            # pre-uniformized copy blocks: consecutive offsets stay
            # block-aligned only if every graph is a whole number of them
            assert all(n % spec.copy_nodes == 0 for n in n_sizes)
            assert all(e % spec.copy_edges == 0 for e in e_sizes)
        node_off = np.concatenate([[0], np.cumsum(n_sizes)])
        edge_off = np.concatenate([[0], np.cumsum(e_sizes)])
    N, E, NG = spec.num_nodes, spec.num_edges, spec.num_graphs

    # --- per-graph receiver-sorted edge permutations ---
    perms = []
    for g in graphs:
        ei = np.asarray(g.edge_index)
        perms.append(np.lexsort((ei[0], ei[1])))  # by receiver, then sender

    # --- core index arrays ---
    if uniform:
        # padding edges park on their own block's trailing slot — always
        # a padding node (uniform_nodes reserves it), keeping receivers
        # non-decreasing and block-local indices in [0, n_u)
        park = (np.repeat(np.arange(NG, dtype=np.int32), e_u) * n_u
                + n_u - 1)
        senders = park.copy()
        receivers = park.copy()
    else:
        senders = np.full(E, N - 1, np.int32)  # padding parks on last slot
        receivers = np.full(E, N - 1, np.int32)
    # padding nodes: node_graph stays IN range (models gather per-graph
    # state with jnp.take(vn, node_graph), which NaN-fills out-of-range
    # ids) pointing at the owning/last graph slot; node_local is OUT of
    # the dense (G, max_nodes_per_graph) range so dense scatters drop
    # padding rows instead of colliding with real slots.
    node_graph = np.full(N, NG - 1, np.int32)
    if uniform:
        node_graph[:] = np.repeat(np.arange(NG, dtype=np.int32), n_u)
    node_local = np.full(
        N, max(spec.max_nodes_per_graph, max(n_sizes)), np.int32
    )
    node_mask = np.zeros(N, bool)
    edge_mask = np.zeros(E, bool)
    for i, g in enumerate(graphs):
        ei = np.asarray(g.edge_index)[:, perms[i]]
        ns, es = node_off[i], edge_off[i]
        senders[es:es + e_sizes[i]] = ei[0] + ns
        receivers[es:es + e_sizes[i]] = ei[1] + ns
        node_graph[ns:node_off[i + 1]] = i
        node_local[ns:ns + n_sizes[i]] = np.arange(n_sizes[i], dtype=np.int32)
        node_mask[ns:ns + n_sizes[i]] = True
        edge_mask[es:es + e_sizes[i]] = True

    graph_mask = np.zeros(NG, bool)
    graph_mask[:G] = True

    # uniform per-copy layout: intra-graph padding rows/edges (copies
    # padded to the (copy_nodes, copy_edges) block) are flagged by the
    # node_valid/edge_valid extras — AND them into the batch masks
    ex0_pre = graphs[0].extras or {}
    if "node_valid" in ex0_pre:
        nv = _pad_rows(
            [np.asarray(g.extras["node_valid"]) for g in graphs],
            n_sizes, N, dtype=bool, offsets=node_off,
        )
        node_mask &= nv
    if "edge_valid" in ex0_pre:
        ev = _pad_rows(
            [
                np.asarray(g.extras["edge_valid"])[perms[i]]
                for i, g in enumerate(graphs)
            ],
            e_sizes, E, dtype=bool, offsets=edge_off,
        )
        edge_mask &= ev

    fields: dict = dict(
        senders=senders,
        receivers=receivers,
        node_graph=node_graph,
        node_local=node_local,
        node_mask=node_mask,
        edge_mask=edge_mask,
        graph_mask=graph_mask,
    )

    # --- node payloads ---
    if graphs[0].x is not None:
        fields["x"] = _pad_rows(
            [g.x for g in graphs], n_sizes, N, offsets=node_off
        )
    if graphs[0].pos is not None:
        fields["pos"] = _pad_rows(
            [g.pos for g in graphs], n_sizes, N, offsets=node_off
        )

    # --- edge payloads ride the permutation ---
    if graphs[0].edge_attr is not None:
        fields["edge_attr"] = _pad_rows(
            [np.asarray(g.edge_attr)[perms[i]] for i, g in enumerate(graphs)],
            e_sizes, E, offsets=edge_off,
        )

    # --- targets ---
    if graphs[0].y is not None:
        if spec.y_is_node_level:
            fields["y"] = _pad_rows(
                [g.y for g in graphs], n_sizes, N, offsets=node_off
            )
        else:
            rows = [np.asarray(g.y).reshape(-1) for g in graphs]
            y = np.zeros((NG, rows[0].shape[0]), rows[0].dtype)
            y[:G] = np.stack(rows)
            fields["y"] = y

    # --- ESC encoding ---
    if graphs[0].enc_offsets is not None and (
        spec.enc_width > 0 or spec.num_enc_nnz > 0
    ):
        fields.update(_batch_encoding(graphs, perms, edge_off, spec))

    # --- subgraph-copy levels ---
    ex0 = graphs[0].extras or {}
    extras_out: dict = {}
    if "num_subgraphs" in ex0 and spec.num_segments > 0:
        fields.update(
            _batch_segments(graphs, n_sizes, node_off, spec)
        )
    if "node_to_subgraph2" in ex0 and spec.num_segments2 > 0:
        fields.update(
            _batch_segments2(graphs, n_sizes, node_off, spec)
        )
    if "node_to_original_node" in ex0 and spec.num_original > 0:
        o_sizes = [int(_ex(g, "num_original_nodes", 0)) for g in graphs]
        assert sum(o_sizes) <= spec.num_original
        o_off = np.concatenate([[0], np.cumsum(o_sizes)])
        node_original = np.full(N, spec.num_original, np.int32)
        for i, g in enumerate(graphs):
            ns = node_off[i]
            node_original[ns:ns + n_sizes[i]] = (
                np.asarray(g.extras["node_to_original_node"]) + o_off[i]
            )
        om = np.zeros(spec.num_original, bool)
        om[:sum(o_sizes)] = True
        fields["node_original"] = node_original
        fields["original_mask"] = om

    # --- labeled link-prediction pairs (inductive-edge task) ---
    if "pair_index" in ex0 and spec.num_pairs > 0:
        p_sizes = [int(np.asarray(g.extras["pair_index"]).shape[1])
                   for g in graphs]
        assert sum(p_sizes) <= spec.num_pairs, (sum(p_sizes), spec.num_pairs)
        P = spec.num_pairs
        # padding pairs park on the padding node slot; pair_mask drops
        # them from the loss and from ranking metrics
        pair_index = np.full((2, P), N - 1, np.int32)
        pair_label = np.zeros(P, np.float32)
        pair_graph = np.full(P, NG - 1, np.int32)
        pair_mask = np.zeros(P, bool)
        p_off = np.concatenate([[0], np.cumsum(p_sizes)])
        for i, g in enumerate(graphs):
            ps, pe = p_off[i], p_off[i + 1]
            pair_index[:, ps:pe] = (
                np.asarray(g.extras["pair_index"]) + node_off[i]
            )
            pair_label[ps:pe] = np.asarray(
                g.extras["pair_label"], np.float32
            )
            pair_graph[ps:pe] = i
            pair_mask[ps:pe] = True
        extras_out.update(
            pair_index=pair_index, pair_label=pair_label,
            pair_graph=pair_graph, pair_mask=pair_mask,
        )

    # --- k-set graphs + extras ---
    extras_out.update(_batch_ksets(graphs, node_off, spec, fields))
    extras_out.update(
        _batch_named_extras(
            graphs, n_sizes, e_sizes, perms, node_off, edge_off, spec
        )
    )

    return GraphBatch(
        extras=extras_out or None,
        nodes_per_graph=spec.uniform_nodes or None,
        edges_per_graph=spec.uniform_edges or None,
        nodes_per_seg=spec.copy_nodes or None,
        edges_per_seg=spec.copy_edges or None,
        **fields,
    )


# fixed coefficients for the row-hash dedup (any odd constants work; the
# hash only routes rows into np.unique — exactness comes from the verify)
_HASH_SEED = np.random.default_rng(0x5CE5).integers(
    1, 2**62, size=4096, dtype=np.int64
) | 1


def _unique_rows(both: np.ndarray):
    """Deduplicate rows of a 2-D integer array -> (unique_rows, inverse).

    np.unique(axis=0) lexsorts with void comparisons (~360 ms at ZINC
    batch shapes, vs a ~3 ms device step). Instead: hash rows with a
    vectorized int64 dot (wrapping multiply-add), unique the 1-D hashes
    (~2 ms radix-friendly sort), and VERIFY exactly by materializing
    uniq[inverse] — on the astronomically unlikely 63-bit collision the
    exact dict walk runs instead, so the result is always correct."""
    E, C = both.shape
    h = both.astype(np.int64, copy=False) @ _HASH_SEED[:C]
    _, first_idx, inv = np.unique(h, return_index=True, return_inverse=True)
    uniq = both[first_idx]
    if np.array_equal(uniq[inv], both):
        return uniq, inv
    # hash collision: exact fallback
    row_sz = C * both.dtype.itemsize
    buf = both.tobytes()
    seen: dict = {}
    inv = np.empty(E, np.int64)
    first_rows = []
    for e in range(E):
        k = buf[e * row_sz:(e + 1) * row_sz]
        i = seen.get(k)
        if i is None:
            i = len(first_rows)
            seen[k] = i
            first_rows.append(e)
        inv[e] = i
    return both[np.asarray(first_rows, np.int64)], inv


def _batch_encoding(graphs, perms, edge_off, spec: BatchSpec) -> dict:
    """Width layout: (E, P) rows. Flat layout: edge-sorted COO entries."""
    E = spec.num_edges
    flat = spec.enc_width == 0
    if flat:
        idx_parts, cnt_parts, edge_parts = [], [], []
    else:
        W = spec.enc_width
        enc_idx = np.zeros((E, W), _ENC_DTYPE)
        enc_cnt = np.zeros((E, W), _ENC_DTYPE)
    for i, g in enumerate(graphs):
        off = np.asarray(g.enc_offsets)
        nnz = np.diff(off)
        if nnz.size == 0:
            continue
        inv = np.empty_like(perms[i])
        inv[perms[i]] = np.arange(len(perms[i]))
        rows_orig = np.repeat(np.arange(len(nnz)), nnz)
        new_rows = inv[rows_orig] + edge_off[i]
        gidx = np.asarray(g.enc_idx)
        gcnt = np.asarray(g.enc_cnt)
        if flat:
            order = np.argsort(new_rows, kind="stable")
            idx_parts.append(gidx[order])
            cnt_parts.append(gcnt[order])
            edge_parts.append(new_rows[order])
        else:
            assert int(nnz.max()) <= spec.enc_width, (
                f"enc row nnz {int(nnz.max())} exceeds width {spec.enc_width}"
            )
            cols = np.arange(len(gidx)) - np.repeat(off[:-1], nnz)
            enc_idx[new_rows, cols] = gidx.astype(_ENC_DTYPE)
            enc_cnt[new_rows, cols] = gcnt.astype(_ENC_DTYPE)
    if not flat:
        if spec.num_enc_rows > 0:
            # dedup layout: unique rows + edge -> row map. Padding edges'
            # all-zero rows dedup into one zero row whose weighted sum is
            # exactly 0, so no special-casing is needed downstream.
            R = spec.num_enc_rows
            both = np.ascontiguousarray(
                np.concatenate([enc_idx, enc_cnt], axis=1)
            )
            uniq, inv = _unique_rows(both)
            assert len(uniq) <= R, (len(uniq), R)
            u_idx = np.zeros((R, W), _ENC_DTYPE)
            u_cnt = np.zeros((R, W), _ENC_DTYPE)
            u_idx[: len(uniq)] = uniq[:, :W]
            u_cnt[: len(uniq)] = uniq[:, W:]
            # real-edge multiplicity per unique row: the weights under
            # which row-level batch-norm statistics equal edge-level ones
            # (padding edge slots are excluded; rows only padding edges
            # map to — and unused row slots — get weight 0)
            emask = np.zeros(E, bool)
            for i in range(len(graphs)):
                emask[edge_off[i]:edge_off[i] + len(perms[i])] = True
            weight = np.bincount(inv[emask], minlength=R).astype(np.float32)
            # sorted-CSR view for the expansion backward (see container)
            perm = np.argsort(inv, kind="stable").astype(np.int32)
            out = {
                "enc_idx": u_idx,
                "enc_cnt": u_cnt,
                "enc_edge_row": inv.astype(np.int32),
                "enc_row_weight": weight,
                "enc_edge_perm": perm,
                "enc_row_sorted": inv[perm].astype(np.int32),
            }
            if spec.num_enc_buckets > 0:
                # bucket compaction: remap ids to the batch's active set;
                # entries with cnt == 0 keep slot 0 (their contribution is
                # 0 regardless of which table row slot 0 names)
                B = spec.num_enc_buckets
                act = np.unique(u_idx[u_cnt > 0])
                assert len(act) <= B, (
                    f"batch uses {len(act)} distinct buckets, budget {B}"
                )
                bucket_ids = np.zeros(B, np.int32)
                bucket_ids[: len(act)] = act
                remap = np.zeros(int(act[-1]) + 2 if len(act) else 2,
                                 _ENC_DTYPE)
                remap[act] = np.arange(len(act), dtype=_ENC_DTYPE)
                out["enc_idx"] = np.where(
                    u_cnt > 0, remap[u_idx], 0
                ).astype(_ENC_DTYPE)
                out["enc_bucket_ids"] = bucket_ids
                # precomputed count matrix (see container.enc_countmat);
                # guarded by size — a few MB/batch is fine for pooled
                # batches, tens of MB is not
                if R * B * 4 <= 16 * 2**20:
                    C = np.zeros((R, B), np.float32)
                    ci = out["enc_idx"].astype(np.int64)
                    np.add.at(
                        C,
                        (np.repeat(np.arange(R), W), ci.ravel()),
                        np.where(u_cnt > 0, u_cnt, 0).astype(np.float32).ravel(),
                    )
                    out["enc_countmat"] = C
            return out
        return {"enc_idx": enc_idx, "enc_cnt": enc_cnt}
    K = spec.num_enc_nnz
    tot = sum(p.shape[0] for p in idx_parts)
    assert tot <= K, (tot, K)
    fi = np.zeros(K, _ENC_DTYPE)
    fc = np.zeros(K, _ENC_DTYPE)
    fe = np.full(K, E - 1, np.int32)  # in-range, zero-count padding
    if tot:
        fi[:tot] = np.concatenate(idx_parts).astype(_ENC_DTYPE)
        fc[:tot] = np.concatenate(cnt_parts).astype(_ENC_DTYPE)
        fe[:tot] = np.concatenate(edge_parts).astype(np.int32)
    return {"enc_flat_idx": fi, "enc_flat_cnt": fc, "enc_flat_edge": fe}


def _batch_segments(graphs, n_sizes, node_off, spec: BatchSpec) -> dict:
    """Subgraph-copy level. `segment_graph`/`segment_mask` exist whenever
    graphs declare `num_subgraphs` (the I2 transform has subgraphs as the
    middle pooling level without a direct node->subgraph map);
    `node_segment` additionally needs `node_to_subgraph`."""
    S = spec.num_segments
    s_sizes = [int(_ex(g, "num_subgraphs", 0)) for g in graphs]
    assert sum(s_sizes) <= S, (sum(s_sizes), S)
    s_off = np.concatenate([[0], np.cumsum(s_sizes)])
    segment_graph = np.full(S, spec.num_graphs - 1, np.int32)
    segment_mask = np.zeros(S, bool)
    for i in range(len(graphs)):
        segment_graph[s_off[i]:s_off[i + 1]] = i
    segment_mask[:s_off[-1]] = True
    out = {"segment_graph": segment_graph, "segment_mask": segment_mask}
    if "node_to_subgraph" in (graphs[0].extras or {}):
        node_segment = np.full(spec.num_nodes, S, np.int32)
        for i, g in enumerate(graphs):
            ns = node_off[i]
            node_segment[ns:ns + n_sizes[i]] = (
                np.asarray(g.extras["node_to_subgraph"]) + s_off[i]
            )
        out["node_segment"] = node_segment
    return out


def _batch_segments2(graphs, n_sizes, node_off, spec: BatchSpec) -> dict:
    S, S2 = spec.num_segments, spec.num_segments2
    s_sizes = [int(_ex(g, "num_subgraphs", 0)) for g in graphs]
    s2_sizes = [int(_ex(g, "num_subgraphs2", 0)) for g in graphs]
    assert sum(s2_sizes) <= S2, (sum(s2_sizes), S2)
    s_off = np.concatenate([[0], np.cumsum(s_sizes)])
    s2_off = np.concatenate([[0], np.cumsum(s2_sizes)])
    node_segment2 = np.full(spec.num_nodes, S2, np.int32)
    segment2_parent = np.full(S2, S, np.int32)
    segment2_mask = np.zeros(S2, bool)
    center = np.full((S2, 2), spec.num_nodes - 1, np.int32)
    for i, g in enumerate(graphs):
        ex = g.extras
        ns = node_off[i]
        node_segment2[ns:ns + n_sizes[i]] = (
            np.asarray(ex["node_to_subgraph2"]) + s2_off[i]
        )
        segment2_parent[s2_off[i]:s2_off[i + 1]] = (
            np.asarray(ex["subgraph2_to_subgraph"]) + s_off[i]
        )
        if "center_idx" in ex:
            center[s2_off[i]:s2_off[i + 1]] = (
                np.asarray(ex["center_idx"]) + node_off[i]
            )
    segment2_mask[:s2_off[-1]] = True
    return {
        "node_segment2": node_segment2,
        "segment2_parent": segment2_parent,
        "segment2_mask": segment2_mask,
        "center_idx": center,
    }


def _batch_ksets(graphs, node_off, spec: BatchSpec, fields) -> dict:
    out: dict = {}
    seg_sizes = [int(_ex(g, "num_subgraphs", 0)) for g in graphs]
    seg_off = np.concatenate([[0], np.cumsum(seg_sizes)])
    set_offs = {}
    for k in (2, 3):
        budget = getattr(spec, f"num_kset{k}")
        if not budget or f"num_kset{k}" not in (graphs[0].extras or {}):
            continue
        sizes = [int(g.extras[f"num_kset{k}"]) for g in graphs]
        assert sum(sizes) <= budget, (k, sum(sizes), budget)
        off = np.concatenate([[0], np.cumsum(sizes)])
        set_offs[k] = off
        tot = int(off[-1])

        iso = np.zeros(budget, np.int32)
        kgraph = np.full(budget, spec.num_graphs, np.int32)
        mask = np.zeros(budget, bool)
        to_sub = np.full(
            budget, spec.num_segments if spec.num_segments else budget,
            np.int32,
        )
        for i, g in enumerate(graphs):
            iso[off[i]:off[i + 1]] = np.asarray(g.extras[f"kset{k}_iso"])
            kgraph[off[i]:off[i + 1]] = i
            shift = seg_off[i] if spec.num_segments else 0
            to_sub[off[i]:off[i + 1]] = (
                np.asarray(g.extras[f"kset{k}_to_subgraph"]) + shift
            )
        mask[:tot] = True

        # set-graph edges, receiver-sorted within each graph
        e_budget = getattr(spec, f"num_kset{k}_edges")
        e_sizes = [
            int(g.extras[f"kset{k}_edge_index"].shape[1]) for g in graphs
        ]
        assert sum(e_sizes) <= e_budget, (k, sum(e_sizes), e_budget)
        # padding: senders in range (gathered), receivers out of range
        # (sorted scatter ids; dropped by segment ops)
        ksend = np.full(e_budget, budget - 1, np.int32)
        krecv = np.full(e_budget, budget, np.int32)
        kemask = np.zeros(e_budget, bool)
        eo = 0
        for i, g in enumerate(graphs):
            ei = np.asarray(g.extras[f"kset{k}_edge_index"])
            perm = np.lexsort((ei[0], ei[1]))
            ei = ei[:, perm]
            ksend[eo:eo + e_sizes[i]] = ei[0] + off[i]
            krecv[eo:eo + e_sizes[i]] = ei[1] + off[i]
            eo += e_sizes[i]
        kemask[:eo] = True

        # member-node assignment
        a_budget = getattr(spec, f"num_kset{k}_assign")
        a_sizes = [int(g.extras[f"kset{k}_assign"].shape[1]) for g in graphs]
        assert sum(a_sizes) <= a_budget, (k, sum(a_sizes), a_budget)
        anode = np.full(a_budget, spec.num_nodes - 1, np.int32)
        aset = np.full(a_budget, budget, np.int32)
        amask = np.zeros(a_budget, bool)
        ao = 0
        for i, g in enumerate(graphs):
            asg = np.asarray(g.extras[f"kset{k}_assign"])
            anode[ao:ao + a_sizes[i]] = asg[0] + node_off[i]
            aset[ao:ao + a_sizes[i]] = asg[1] + off[i]
            ao += a_sizes[i]
        amask[:ao] = True

        out.update({
            f"kset{k}_iso": iso,
            f"kset{k}_graph": kgraph,
            f"kset{k}_mask": mask,
            f"kset{k}_to_subgraph": to_sub,
            f"kset{k}_senders": ksend,
            f"kset{k}_receivers": krecv,
            f"kset{k}_edge_mask": kemask,
            f"kset{k}_assign_node": anode,
            f"kset{k}_assign_set": aset,
            f"kset{k}_assign_mask": amask,
        })

    if spec.num_assign_2to3 and "assign_2to3" in (graphs[0].extras or {}):
        B = spec.num_assign_2to3
        row = np.zeros(B, np.int32)
        col = np.zeros(B, np.int32)
        m = np.zeros(B, bool)
        o = 0
        for i, g in enumerate(graphs):
            a = np.asarray(g.extras["assign_2to3"])
            n = a.shape[1]
            row[o:o + n] = a[0] + set_offs[2][i]
            col[o:o + n] = a[1] + set_offs[3][i]
            o += n
        m[:o] = True
        out.update({
            "assign_2to3_row": row,
            "assign_2to3_col": col,
            "assign_2to3_mask": m,
        })
    return out


def _batch_named_extras(graphs, n_sizes, e_sizes, perms, node_off, edge_off,
                        spec):
    """Generic extras: node-aligned padded like x, edge-aligned permuted
    like edge_attr, subgraph-copy-aligned padded to the segment budget
    (e.g. node-level targets of copy-based models — one row per original
    node == one row per copy), dense per-graph matrices stacked into
    (G, M, M)."""
    out: dict = {}
    ex0 = graphs[0].extras or {}
    seg_sizes = [int((g.extras or {}).get("num_subgraphs", 0))
                 for g in graphs]
    seg_off = np.concatenate([[0], np.cumsum(seg_sizes)])
    for key, v0 in ex0.items():
        if key in _STRUCTURAL_KEYS or key.startswith("kset") \
                or key.startswith("num_"):
            if key == "attn_bias":
                M = spec.max_nodes_per_graph
                ab = np.zeros(
                    (spec.num_graphs, M, M), np.asarray(v0).dtype
                )
                for i, g in enumerate(graphs):
                    a = np.asarray(g.extras[key])
                    ab[i, :a.shape[0], :a.shape[1]] = a
                out[key] = ab
            elif key == "orig_adj":
                K = spec.max_segments_per_graph
                adj = np.zeros(
                    (spec.num_graphs, K, K), np.asarray(v0).dtype
                )
                for i, g in enumerate(graphs):
                    a = np.asarray(g.extras[key])
                    adj[i, :a.shape[0], :a.shape[1]] = a
                out[key] = adj
            continue
        v0 = np.asarray(v0)
        if v0.ndim >= 1 and v0.shape[0] == graphs[0].num_nodes:
            out[key] = _pad_rows(
                [np.asarray(g.extras[key]) for g in graphs],
                n_sizes, spec.num_nodes, offsets=node_off,
            )
        elif v0.ndim >= 1 and v0.shape[0] == graphs[0].num_edges:
            out[key] = _pad_rows(
                [
                    np.asarray(g.extras[key])[perms[i]]
                    for i, g in enumerate(graphs)
                ],
                e_sizes, spec.num_edges, offsets=edge_off,
            )
        elif (v0.ndim >= 1 and seg_sizes[0]
              and v0.shape[0] == seg_sizes[0] and spec.num_segments > 0):
            out[key] = _pad_rows(
                [np.asarray(g.extras[key]) for g in graphs],
                seg_sizes, spec.num_segments, offsets=seg_off,
            )
        else:
            raise ValueError(
                f"extras[{key!r}] has no batching rule "
                f"(shape {v0.shape}, graph has {graphs[0].num_nodes} nodes/"
                f"{graphs[0].num_edges} edges)"
            )
    return out


# ---------------------------------------------------------------------------
# iterators
# ---------------------------------------------------------------------------


def batch_iterator(
    graphs: Sequence[GraphData],
    spec: BatchSpec,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> Iterator[GraphBatch]:
    """Fixed-count batches: consecutive groups of `spec.num_graphs`."""
    idx = np.arange(len(graphs))
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    bs = spec.num_graphs
    for i in range(0, len(graphs), bs):
        yield pad_and_batch([graphs[j] for j in idx[i:i + bs]], spec)


def packed_batch_iterator(
    graphs: Sequence[GraphData],
    spec: BatchSpec,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> Iterator[GraphBatch]:
    """Greedy packing: fill each batch until a budget (graphs, nodes,
    edges, encoding entries) would overflow. Covers every graph exactly
    once; never needs more batches than the fixed-count iterator."""
    idx = np.arange(len(graphs))
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    caps = {
        "graphs": spec.num_graphs,
        "nodes": spec.num_nodes - 1,  # reserve the parking node
        "edges": spec.num_edges,
        "enc": spec.num_enc_nnz or np.inf,
    }
    cur: list[GraphData] = []
    used = dict(graphs=0, nodes=0, edges=0, enc=0)
    for j in idx:
        g = graphs[j]
        nnz = (
            int(np.diff(np.asarray(g.enc_offsets)).sum())
            if (g.enc_offsets is not None and spec.num_enc_nnz) else 0
        )
        need = dict(graphs=1, nodes=g.num_nodes, edges=g.num_edges, enc=nnz)
        if cur and any(used[k] + need[k] > caps[k] for k in caps):
            yield pad_and_batch(cur, spec)
            cur, used = [], dict(graphs=0, nodes=0, edges=0, enc=0)
        cur.append(g)
        for k in need:
            used[k] += need[k]
    if cur:
        yield pad_and_batch(cur, spec)
