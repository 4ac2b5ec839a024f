"""Graph-level ESC pre-transform.

The analogue of the reference's `create_subgraphs(data, ...)`
(`utils_edge_efficient.py:20-151`): takes a raw graph, returns the same
graph with (a) the canonical self-looped edge list, (b) edge attributes
extended over appended self-loops with a fill value (PyG add_self_loops
semantics), and (c) per-edge structural encoding rows attached.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import multiprocessing as mp
from functools import partial

from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.escgnn import EscConfig, esc_encode


def esc_transform(
    g: GraphData,
    cfg: EscConfig,
    self_loop_fill=1,
) -> GraphData:
    if cfg.max_nodes_per_hop is not None:
        # per-hop frontier subsampling (reference
        # `utils_edge_efficient.py:238-240`) now runs on the FAST
        # vectorized path: the subsample is drawn from a rng derived per
        # (seed, root, hop) with the per-graph seed below, so caches are
        # deterministic and the per-edge oracle reproduces it bit-equal
        # (tests/test_featurize.py). The native C++ core declines mnph
        # configs (no derived-stream sampler there yet).
        seed = int(
            (np.asarray(g.edge_index, np.uint64).sum()
             + np.uint64(g.num_nodes)) & np.uint64(0x7FFFFFFF)
        )
        enc = esc_encode(g.num_nodes, g.edge_index, cfg, sample_seed=seed)
    else:
        # native C++ core first (bit-equal, ~7x faster — OpenMP across
        # edges, Gauss-Jordan rd); returns None when it declines (build
        # unavailable, non-default layout, or a failed Laplacian residual
        # check), then the vectorized numpy/SVD path takes over
        from escgnn_tpu.native.escfeat import esc_encode_native

        enc = esc_encode_native(g.num_nodes, g.edge_index, cfg)
        if enc is None:
            enc = esc_encode(g.num_nodes, g.edge_index, cfg)
    edge_attr = g.edge_attr
    if edge_attr is not None and cfg.self_loop:
        # Original non-self-loop edges keep their attrs (in order); the
        # appended (i, i) loops get the fill value.
        orig = g.edge_index[0] != g.edge_index[1]
        base = edge_attr[orig]
        fill_shape = (int(enc.self_loop_attr_mask.sum()),) + edge_attr.shape[1:]
        fill = np.full(fill_shape, self_loop_fill, dtype=edge_attr.dtype)
        edge_attr = np.concatenate([base, fill], axis=0)
    return GraphData(
        num_nodes=g.num_nodes,
        edge_index=enc.edge_index,
        x=g.x,
        edge_attr=edge_attr,
        y=g.y,
        pos=g.pos,
        enc_idx=enc.enc_idx,
        enc_cnt=enc.enc_cnt,
        enc_offsets=enc.enc_offsets,
        extras=g.extras,
    )


def featurize_many(
    graphs: list[GraphData],
    cfg: EscConfig,
    num_workers: int = 0,
    self_loop_fill=1,
) -> list[GraphData]:
    """Apply `esc_transform` to many graphs, optionally across processes
    (the reference fans out with pqdm, `dataset_zinc.py:77-78`)."""
    fn = partial(esc_transform, cfg=cfg, self_loop_fill=self_loop_fill)
    if num_workers and num_workers > 1 and len(graphs) > 8:
        # fork, not spawn: workers run pure numpy (no jax), and spawn
        # re-imports __main__ which breaks stdin-script and REPL callers.
        with mp.get_context("fork").Pool(num_workers) as pool:
            return pool.map(fn, graphs, chunksize=32)
    return [fn(g) for g in graphs]
