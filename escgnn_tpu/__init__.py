"""escgnn_tpu — a TPU-native subgraph-GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ESC-GNN
("An Efficient Subgraph GNN with Provable Substructure Counting Power",
KDD 2024; reference implementation pkuyzy/ESC-GNN).

Design pillars (vs. the reference's CUDA/torch design):

* **Static shapes everywhere.** The reference materializes ragged per-graph
  tensors and collates with per-key cumsum rules (`batch.py` in the
  reference). Here every batch is padded to a static (num_graphs,
  num_nodes, num_edges, enc_width) budget with validity masks, so a single
  XLA compilation serves the whole dataset.
* **Per-edge fixed-width sparse encodings.** The reference stores the
  1800-dim structural count vector as flat COO triples
  (`pos_index/pos_enc/pos_batch`) and reduces with
  gather + `global_add_pool` (reference `zinc_models.py:590`). Here each
  edge owns a fixed-width row of (bucket, count) pairs, so the embedding
  reduce is a static gather + weighted sum that XLA tiles onto the MXU —
  no scatter at all on the hot path.
* **Receiver-sorted edges + segment-sum message passing.** Edges are
  sorted by destination at collate time so aggregation is a sorted
  segment-sum (and a Pallas kernel where it matters).
* **SPMD via jax.sharding.** Graphs are independent; data parallelism is a
  leading device axis over the mesh; collectives are XLA-emitted psums.
"""

__version__ = "0.3.0"

from escgnn_tpu.data.container import GraphBatch, GraphData  # noqa: F401
