"""Graph containers.

`GraphData` is the host-side (numpy, ragged) record — the analogue of a
PyG `Data` object (which the reference mutates freely; see e.g.
`utils_edge_efficient.py:140-151` stashing `pos_index/pos_enc/pos_batch`).
Arbitrary per-graph annotations live in the `extras` dict instead of
dynamic attributes, so batching rules are explicit (see `batching.py`).

`GraphBatch` is the device-side, statically-shaped batch: a frozen pytree
of padded arrays + validity masks. Sizes (`num_nodes` etc.) are derived
from mask shapes, never stored — so they stay static under `jit` and the
batch survives `jax.tree.map` (stacking, sharding, slicing) unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np
from flax import struct


@dataclasses.dataclass
class GraphData:
    """One ragged graph (host side, numpy).

    Required: `num_nodes`, `edge_index` (2, E).
    Optional payloads: node features `x` (N, ...), edge features
    `edge_attr` (E, ...), targets `y` (node-level (N, T) or graph-level
    (T,)), 3D coordinates `pos` (N, 3).

    ESC structural encoding (ragged CSR over edges — the reference's
    sparse `pos_index/pos_enc/pos_batch` triple, `utils_edge_efficient.py:
    140-151`): `enc_idx`/`enc_cnt` are flat (total_nnz,) arrays and
    `enc_offsets` (E+1,) delimits each edge's run.

    `extras`: named per-graph annotations with batching rules keyed by
    name/shape (subgraph-copy index vectors, k-set graphs, dense
    attn_bias/orig_adj matrices, positional encodings, ...).
    """

    num_nodes: int
    edge_index: np.ndarray
    x: Optional[np.ndarray] = None
    edge_attr: Optional[np.ndarray] = None
    y: Optional[np.ndarray] = None
    pos: Optional[np.ndarray] = None
    enc_idx: Optional[np.ndarray] = None
    enc_cnt: Optional[np.ndarray] = None
    enc_offsets: Optional[np.ndarray] = None
    extras: Optional[dict] = None

    @property
    def num_edges(self) -> int:
        return int(np.asarray(self.edge_index).shape[1])

    def enc_row(self, e: int) -> tuple[np.ndarray, np.ndarray]:
        """(bucket ids, counts) of edge `e`'s structural-encoding run."""
        lo, hi = int(self.enc_offsets[e]), int(self.enc_offsets[e + 1])
        return (
            np.asarray(self.enc_idx[lo:hi]),
            np.asarray(self.enc_cnt[lo:hi]),
        )


class GraphBatch(struct.PyTreeNode):
    """Statically-shaped padded batch (device side).

    Every field is an array (or None); padded slots are flagged by the
    masks. Index-vector padding conventions (chosen so even *unmasked*
    segment reductions ignore padding — JAX drops out-of-range scatter/
    segment ids and clips gathers):

      * padding edges park on the last (masked) node slot, keeping
        `receivers` globally non-decreasing (sorted segment-sums);
      * padding nodes carry `node_graph == num_graphs` (out of range);
      * padding segments/copies carry out-of-range parents likewise;
      * `center_idx` padding points at the last node slot (in range,
        because it is gathered, not scattered).
    """

    # core graph arrays
    x: Optional[Any] = None
    y: Optional[Any] = None
    pos: Optional[Any] = None
    edge_attr: Optional[Any] = None
    senders: Optional[Any] = None
    receivers: Optional[Any] = None
    # validity masks (their lengths ARE the static budgets)
    node_mask: Optional[Any] = None
    edge_mask: Optional[Any] = None
    graph_mask: Optional[Any] = None
    # assignment vectors
    node_graph: Optional[Any] = None  # node -> graph id
    node_local: Optional[Any] = None  # node index within its own graph
    # ESC encoding, fixed-width layout: (E, P) bucket ids + counts
    enc_idx: Optional[Any] = None
    enc_cnt: Optional[Any] = None
    # ESC encoding, flat COO layout: (K,) entries sorted by edge id
    enc_flat_idx: Optional[Any] = None
    enc_flat_cnt: Optional[Any] = None
    enc_flat_edge: Optional[Any] = None
    # ESC encoding, dedup layout: enc_idx/enc_cnt hold the batch's UNIQUE
    # (R, P) rows and this maps each edge to its row (molecular graphs
    # repeat histograms heavily — ~3.4x fewer rows on ZINC batches)
    enc_edge_row: Optional[Any] = None
    # dedup layout: real-edge multiplicity of each unique row (R,) f32 —
    # the exact weights that make batch-norm statistics over rows equal
    # statistics over edges (padding edges/rows carry weight 0)
    enc_row_weight: Optional[Any] = None
    # dedup layout: stable argsort of enc_edge_row (E,) int32 and the row
    # ids in that order — the sorted-CSR view that lets the row->edge
    # expansion backward run as a Pallas tiled one-hot matmul segment-sum
    # instead of XLA's serial scatter-add (ops/zemb.py expand_rows)
    enc_edge_perm: Optional[Any] = None
    enc_row_sorted: Optional[Any] = None
    # bucket compaction (dedup layout): enc_idx is remapped into
    # [0, len(enc_bucket_ids)) and this maps compact slots back to
    # embedding-table rows (spec.num_enc_buckets)
    enc_bucket_ids: Optional[Any] = None
    # precomputed dense count matrix C (R, num_enc_buckets) f32 — purely
    # batch data (C[r, z] = sum of counts of bucket z in unique row r),
    # built once per pooled batch on the host so the per-step z-emb
    # reduce is a single matmul C @ active_table with no on-device
    # count-matrix build (that build profiled ~0.1 ms/step)
    enc_countmat: Optional[Any] = None
    # subgraph-copy level (NGNN/k-GNN two-level pooling)
    node_segment: Optional[Any] = None  # node -> subgraph copy
    segment_graph: Optional[Any] = None  # copy -> graph
    segment_mask: Optional[Any] = None
    # (root, neighbor)-pair copy level (I2GNN three-level pooling)
    node_segment2: Optional[Any] = None  # node -> pair copy
    segment2_parent: Optional[Any] = None  # pair copy -> root subgraph
    segment2_mask: Optional[Any] = None
    center_idx: Optional[Any] = None  # (S2, 2) batched (root, nbr) nodes
    # original-node level (I2GNN mean-context pooling)
    node_original: Optional[Any] = None  # copy node -> original node
    original_mask: Optional[Any] = None
    # named padded extras (k-set graphs, attn_bias, posenc, ...)
    extras: Optional[dict] = None
    # uniform layout (static metadata, not traced): when set, node id
    # g*nodes_per_graph + i / edge id g*edges_per_graph + k — every graph
    # occupies an identically-sized block, so message passing can run as
    # per-graph batched one-hot einsums on the MXU instead of global
    # gather/scatter (see models/layers.py GINEConv dense path)
    nodes_per_graph: Optional[int] = struct.field(
        pytree_node=False, default=None
    )
    edges_per_graph: Optional[int] = struct.field(
        pytree_node=False, default=None
    )
    # uniform per-COPY layout (data/uniform_copies.py): every subgraph
    # copy occupies an identical (nodes_per_seg, edges_per_seg) block, so
    # the copy-family message passing takes the same one-hot-einsum path
    # per copy and node -> copy pooling is a masked reshape. Block index
    # == copy segment id (node_segment for NGNN, node_segment2 for I2GNN).
    nodes_per_seg: Optional[int] = struct.field(
        pytree_node=False, default=None
    )
    edges_per_seg: Optional[int] = struct.field(
        pytree_node=False, default=None
    )
    # two-size bucketed per-copy layout (data/uniform_copies.py
    # bucketize_copy_batch): copies are grouped into a SMALL region of
    # Cs (n_s, e_s) blocks followed by a LARGE region of Cl (n_l, e_l)
    # blocks — ((Cs, n_s, e_s), (Cl, n_l, e_l)). Region-local block
    # index == copy segment id within the concatenated segment order.
    # Trades one extra einsum dispatch per aggregation for the
    # dataset-wide single-size block padding (~1.5x fewer padded edge
    # slots on I2GNN bench shapes — the round-4 identified lever).
    seg_regions: Optional[tuple] = struct.field(
        pytree_node=False, default=None
    )

    @property
    def num_nodes(self) -> int:
        return self.node_mask.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_mask.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]
