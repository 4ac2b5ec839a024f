#!/usr/bin/env python
"""Ablation timing of the flagship train step (bench.py shapes).

Times the full ZINC NestedGIN_eff train step and variants with pieces
stubbed out, to localize where the step time goes:

  full        : the bench.py step
  no_agg      : GINE gather+segment_sum replaced by a broadcast mean
                (keeps every matmul/BN; removes the per-edge gather/scatter)
  no_zemb     : z-emb reduce + z_embedding MLP replaced by zeros
  no_agg_zemb : both — what's left is MLPs/BN/head/optimizer
  fwd_only    : training-mode forward without grad

Run on the chip (no args). Differences between variants approximate the
cost of the removed piece (XLA refuses to run dead code, so stubs keep a
cheap live use of the inputs they bypass).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench

    graphs = bench.make_zinc_like_graphs(num=128)

    import jax
    from escgnn_tpu.utils import setup_jax

    setup_jax()
    import jax.numpy as jnp
    from flax import linen as nn

    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    import escgnn_tpu.models.nested_gin_eff as NGE
    import escgnn_tpu.models.layers as L
    from escgnn_tpu.train.loop import (
        TrainState,
        adam_with_plateau,
        l1_graph_loss,
        make_train_step,
    )

    spec = BatchSpec.exact(graphs, enc_layout="dedup")
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    real_edges = int(np.sum([g.num_edges for g in graphs]))

    class NoAggGINEConv(nn.Module):
        """GINEConv with the gather/scatter replaced by a broadcast mean of
        the edge messages — keeps lin_edge and the MLP live at identical
        shapes, removes the take + segment_sum."""

        mlp: nn.Module
        edge_dim: int | None = None
        edge_shard_axis: str | None = None
        uniform_nodes: int | None = None

        @nn.compact
        def __call__(self, x, senders, receivers, edge_emb, edge_mask,
                     node_mask=None, *, deterministic, use_running_average):
            in_ch = x.shape[-1]
            eps = self.param("eps", nn.initializers.zeros, ())
            if self.edge_dim is not None:
                edge_emb = L.TorchDense(in_ch, name="lin_edge")(edge_emb)
            msg = nn.relu(edge_emb)
            agg = jnp.broadcast_to(
                jnp.mean(msg, axis=0, keepdims=True), x.shape
            ).astype(x.dtype)
            out = (1.0 + eps) * x + agg
            return self.mlp(out, node_mask, deterministic=deterministic,
                            use_running_average=use_running_average)

    def zemb_stub(table, batch):
        E = batch.senders.shape[0]
        # keep a live (but trivially cheap) use of the table so its adam
        # state stays in the step
        return jnp.zeros((E, table.shape[1]), jnp.float32) + table[0] * 1e-30

    from contextlib import contextmanager

    @contextmanager
    def patched(no_agg=False, no_zemb=False):
        # the patches must stay active until the jitted step has TRACED
        # (first call), not just through model.init — flax resolves the
        # module-global names at trace time
        orig_conv, orig_zemb = NGE.GINEConv, NGE.zemb_from_batch
        orig_rows = NGE.zemb_unique_rows
        if no_agg:
            NGE.GINEConv = NoAggGINEConv
        if no_zemb:
            NGE.zemb_from_batch = zemb_stub
            # dedup batches with dropout==0 take the unique-row path
            # (zemb_unique_rows + expand_rows), not zemb_from_batch —
            # returning None forces the model onto the stubbed path
            NGE.zemb_unique_rows = lambda table, batch: None
        try:
            yield
        finally:
            NGE.GINEConv, NGE.zemb_from_batch = orig_conv, orig_zemb
            NGE.zemb_unique_rows = orig_rows

    def build():
        model = NGE.NestedGINEff(
            NGE.NestedGINEffConfig(
                hidden=256, num_layers=5, dropout=0.0, act="elu",
                graph_pred=True, pool="add", use_x_embedding_jk=False,
                head_order="dropout_act", node_embed_vocab=100,
                node_embed_dim=32, edge_embed_vocab=100,
                edge_embed_dim=32, compute_dtype="bfloat16",
            )
        )
        rng = jax.random.key(0)
        variables = model.init(rng, batch)
        state = TrainState.create(
            variables["params"], variables.get("batch_stats", {}),
            adam_with_plateau(5e-4),
        )
        step = make_train_step(model, l1_graph_loss)
        return model, state, step

    def timestep(state, step, iters=50):
        rng = jax.random.key(1)
        state, loss = step(state, batch, rng)
        float(loss)
        best = float("inf")
        # state buffers are donated by the step: thread one state through
        # all repeats, never reuse a pre-donation reference
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                rng, sub = jax.random.split(rng)
                state, loss = step(state, batch, sub)
            float(loss)
            best = min(best, time.perf_counter() - t0)
        return best / iters

    results = {}
    for name, kw in [
        ("full", {}),
        ("no_agg", dict(no_agg=True)),
        ("no_zemb", dict(no_zemb=True)),
        ("no_agg_zemb", dict(no_agg=True, no_zemb=True)),
    ]:
        with patched(**kw):
            model, state, step = build()
            dt = timestep(state, step)
        results[name] = dt
        print(f"{name:12s}: {dt * 1e3:7.3f} ms/step   "
              f"({real_edges / dt / 1e6:.2f} M edges/s)", flush=True)

    # fwd-only (training-mode forward, no grad)
    model, state, step = build()

    @jax.jit
    def fwd(params, bstats, batch, rng):
        out, _ = model.apply(
            {"params": params, "batch_stats": bstats}, batch,
            deterministic=False, use_running_average=False,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        return jnp.sum(out)

    rng = jax.random.key(2)
    float(fwd(state.params, state.batch_stats, batch, rng))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(50):
            acc = fwd(state.params, state.batch_stats, batch, rng)
        float(acc)
        best = min(best, time.perf_counter() - t0)
    print(f"{'fwd_only':12s}: {best / 50 * 1e3:7.3f} ms/step", flush=True)

    full, na, nz, naz = (results[k] for k in
                         ("full", "no_agg", "no_zemb", "no_agg_zemb"))
    print("\nattribution (ms):")
    print(f"  gather/scatter agg : {(full - na) * 1e3:6.3f}")
    print(f"  z-emb path         : {(full - nz) * 1e3:6.3f}")
    print(f"  everything else    : {naz * 1e3:6.3f}")


if __name__ == "__main__":
    main()
