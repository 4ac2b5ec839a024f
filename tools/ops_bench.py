#!/usr/bin/env python
"""Micro-benchmarks of the hot ops on the real chip.

Guides kernel work: times the z-embedding reduce variants, the GINE
segment-sum aggregation, and full train steps in fp32 vs bf16, printing
one line per config. Run on TPU (no args).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _drain(out):
    """Force a scalar host transfer: block_until_ready does NOT reliably
    wait over the remote-execution tunnel (measured: a 1-TFLOP matmul
    'took' 0.2 ms with it)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def timeit(fn, *args, iters=30):
    out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters


def bench_zemb(E=40960, P=72, Z=1800, H=256):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Z, (E, P)).astype(np.int32))
    cnt = jnp.asarray((rng.random((E, P)) * 3).astype(np.float32))

    @jax.jit
    def gather_reduce(table, idx, cnt):
        rows = jnp.take(table, idx, axis=0)
        return jnp.einsum("eph,ep->eh", rows, cnt,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def gather_reduce_bf16(table, idx, cnt):
        rows = jnp.take(table.astype(jnp.bfloat16), idx, axis=0)
        return jnp.einsum("eph,ep->eh", rows, cnt.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @jax.jit
    def onehot_matmul(table, idx, cnt):
        # blocked dense: scatter counts into (E, Z) then one matmul
        C = jnp.zeros((idx.shape[0], table.shape[0]), jnp.float32)
        C = C.at[jnp.arange(idx.shape[0])[:, None], idx].add(cnt)
        return C @ table

    for name, fn in [
        ("zemb/gather_f32", gather_reduce),
        ("zemb/gather_bf16", gather_reduce_bf16),
        ("zemb/onehot_mm", onehot_matmul),
    ]:
        dt = timeit(fn, table, idx, cnt)
        gb = (E * P * (H * 4 + 8) + E * H * 4) / 1e9
        print(f"{name:24s} {dt*1e3:8.3f} ms  ({gb/dt:6.1f} GB/s eff)")


def bench_segment_sum(E=40960, N=3848, H=256):
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
    recv = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
    recv_unsorted = jnp.asarray(rng.integers(0, N, E).astype(np.int32))

    @partial(jax.jit, static_argnums=(2,))
    def seg(m, r, sorted_):
        return jax.ops.segment_sum(m, r, num_segments=N,
                                   indices_are_sorted=sorted_)

    for name, r, s in [
        ("segsum/sorted", recv, True),
        ("segsum/unsorted", recv_unsorted, False),
    ]:
        dt = timeit(lambda m, rr: seg(m, rr, s), msgs, r)
        gb = (E * H * 4 * 2) / 1e9
        print(f"{name:24s} {dt*1e3:8.3f} ms  ({gb/dt:6.1f} GB/s eff)")

    # one-hot matmul alternative for aggregation (MXU instead of scatter)
    @jax.jit
    def onehot_agg(m, r):
        oh = (r[None, :] == jnp.arange(N)[:, None]).astype(jnp.bfloat16)
        return oh @ m.astype(jnp.bfloat16)

    dt = timeit(onehot_agg, msgs, recv)
    print(f"{'segsum/onehot_mm_bf16':24s} {dt*1e3:8.3f} ms")


def bench_model_step():
    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
    from escgnn_tpu.train.loop import (
        TrainState, adam_with_plateau, l1_graph_loss, make_train_step,
    )
    from bench import make_zinc_like_graphs

    graphs = make_zinc_like_graphs(num=128)
    spec = BatchSpec.from_graphs(graphs, batch_size=128)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    real_edges = int(np.sum([g.num_edges for g in graphs]))

    for dtype in ["float32", "bfloat16"]:
        model = NestedGINEff(
            NestedGINEffConfig(
                hidden=256, num_layers=5, act="elu", graph_pred=True,
                pool="add", use_x_embedding_jk=False,
                head_order="dropout_act", node_embed_vocab=100,
                edge_embed_vocab=100, compute_dtype=dtype,
            )
        )
        rng = jax.random.key(0)
        variables = model.init(rng, batch)
        state = TrainState.create(
            variables["params"], variables.get("batch_stats", {}),
            adam_with_plateau(5e-4),
        )

        @jax.jit
        def fwd(params, bs, b):
            return model.apply({"params": params, "batch_stats": bs}, b)

        dt = timeit(fwd, state.params, state.batch_stats, batch, iters=20)
        print(f"fwd_only/{dtype:9s}   {dt*1e3:8.2f} ms  "
              f"{real_edges/dt/1e6:6.2f} M edges/s")

        step = make_train_step(model, l1_graph_loss)
        state, loss = step(state, batch, rng)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            rng, sub = jax.random.split(rng)
            state, loss = step(state, batch, sub)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / iters
        print(f"train_step/{dtype:9s} {dt*1e3:8.2f} ms  "
              f"{real_edges/dt/1e6:6.2f} M edges/s")

    # dispatch overhead: trivial jit round-trip through the tunnel
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a + 1)
    dt = timeit(f, x, iters=50)
    print(f"dispatch/trivial_jit  {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_zemb()
    bench_segment_sum()
    bench_model_step()
