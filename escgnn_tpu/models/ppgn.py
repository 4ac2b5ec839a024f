"""PPGN — Provably Powerful Graph Networks (dense N x N path).

Capability mirror of the reference's PPGN stack:
  * RegularBlock (reference `modules/ppgn_modules.py:5-30`): two 1x1-conv
    MLPs over the channel dim, a per-channel N x N matmul, and a skip
    projection of [input ‖ product].
  * diag/offdiag mean pooling at graph or node level
    (`run_graphcount.py:197-205`).
  * PPGN_eff (`run_graphcount.py:207-308`): the ESC per-edge structural
    embedding (through the z_embedding MLP) is scattered into the dense
    edge channels alongside the adjacency, then 4 regular blocks + FC head.

TPU design: channels-last (G, N, N, C) dense tensors; the per-channel
matmul is one einsum the MXU eats directly; all blocks re-mask padded
rows/cols so padding stays exactly zero. The dense pair tensor is built
on device from the sparse batch via one scatter (senders/receivers +
node_local), so PPGN consumes the same GraphBatch as everything else.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import TorchDense
from escgnn_tpu.ops.zemb import zemb_from_batch


def _pair_mask(node_mask_dense):  # (G, N) -> (G, N, N, 1)
    m = node_mask_dense.astype(jnp.float32)
    return (m[:, :, None] * m[:, None, :])[..., None]


class MlpBlock(nn.Module):
    """depth x [1x1 conv + ReLU] over the channel dimension."""

    features: int
    depth: int = 2
    dtype: object = None  # compute dtype between convs (None = input's)

    @nn.compact
    def __call__(self, x):  # (G, N, N, C)
        for i in range(self.depth):
            x = TorchDense(self.features, name=f"conv{i}")(x)
            x = nn.relu(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)
        return x


class RegularBlock(nn.Module):
    features: int
    depth: int = 2
    dtype: object = None  # bf16 conv stacks (f32 params, f32 accumulate)

    @nn.compact
    def __call__(self, x, pmask):  # x: (G, N, N, C), pmask: (G, N, N, 1)
        cdt = self.dtype or x.dtype
        pm = pmask.astype(cdt)
        m1 = MlpBlock(self.features, self.depth, dtype=self.dtype,
                      name="mlp1")(x) * pm
        m2 = MlpBlock(self.features, self.depth, dtype=self.dtype,
                      name="mlp2")(x) * pm
        # per-channel N x N matmul: (G,N,K,C) = sum_m m1[G,N,m,C] m2[G,m,K,C]
        mult = jnp.einsum(
            "gnmc,gmkc->gnkc", m1, m2, preferred_element_type=jnp.float32
        ).astype(cdt)
        out = TorchDense(self.features, name="skip")(
            jnp.concatenate([x.astype(cdt), mult], axis=-1)
        )
        return out.astype(cdt) * pm


def diag_offdiag_meanpool(x, node_mask_dense, level="graph"):
    """(G, N, N, C) -> graph: (G, 2C); node: (G, N, 2C). Output f32.

    Matches reference `diag_offdiag_meanpool` (`run_graphcount.py:197-205`)
    with true (unpadded) node counts.

    Reads x in ITS dtype and accumulates the reductions in f32
    (`jnp.sum(..., dtype=f32)` upcasts each element before adding —
    numerically identical to casting the whole grid first, which is
    what this function's call site used to do, but halves the pooling
    kernel's HBM read bytes on the bf16 stacks: the round-4 roofline
    chase measured the fused pooling reduce at 87 MB / 68 GB/s / 10%
    of the PPGN step, BASELINE.md round-4 verdicts)."""
    m = node_mask_dense.astype(jnp.float32)  # (G, N)
    n_real = jnp.maximum(jnp.sum(m, axis=1), 1.0)  # (G,)
    diag = jnp.einsum("gnnc->gnc", x).astype(jnp.float32)  # padding rows 0
    if level == "graph":
        mean_diag = jnp.sum(diag, axis=1) / n_real[:, None]
        total = jnp.sum(x, axis=(1, 2), dtype=jnp.float32)
        denom = jnp.maximum(n_real * n_real - n_real, 1.0)
        mean_offdiag = (total - mean_diag * n_real[:, None]) / denom[:, None]
        return jnp.concatenate([mean_diag, mean_offdiag], axis=-1)
    # node level: row-sum + col-sum - 2*diag (reference keeps it unnormalized)
    row = jnp.sum(x, axis=2, dtype=jnp.float32)
    col = jnp.sum(x, axis=1, dtype=jnp.float32)
    off = row + col - 2 * diag
    return jnp.concatenate([diag, off], axis=-1)


@dataclasses.dataclass(frozen=True)
class PPGNConfig:
    emb_dim: int = 64
    num_rb_layers: int = 4
    depth_of_mlp: int = 2
    out_dim: int = 1
    node_level: bool = False  # y_ndim == 2 in the reference
    use_esc: bool = True  # PPGN_eff: inject ESC edge encoding channels
    z_dim: int = 1800
    max_nodes: int = 32  # dense N (static)
    # float32 | bfloat16 regular-block stacks (f32 master params, f32
    # einsum accumulation, f32 head) — the flagship precision recipe
    compute_dtype: str = "float32"
    # node-level pooling implementation: "xla" (fused by XLA) or
    # "pallas" (ops/ppgn_pool.py one-pass kernel — the round-5 lever
    # against the 68 GB/s pooling fusion, BASELINE.md r04 verdicts)
    pool_impl: str = "xla"


class PPGN(nn.Module):
    cfg: PPGNConfig

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        *,
        deterministic: bool = True,
        use_running_average: bool = True,
    ):
        cfg = self.cfg
        G = batch.num_graphs
        N = cfg.max_nodes

        # dense node mask + scatter helpers
        nm = jnp.zeros((G, N), bool).at[batch.node_graph, batch.node_local].set(
            batch.node_mask
        )
        src_l = jnp.take(batch.node_local, batch.senders)
        dst_l = jnp.take(batch.node_local, batch.receivers)
        e_g = jnp.take(batch.node_graph, batch.receivers)

        # edge channels: [adjacency ‖ z_embedding(ESC enc)] scattered dense
        if cfg.use_esc and (batch.enc_idx is not None or batch.enc_flat_idx is not None):
            z_table = self.param(
                "z_initial", nn.initializers.normal(1.0), (cfg.z_dim, cfg.emb_dim)
            )
            z = zemb_from_batch(z_table, batch)
            # z_embedding MLP: Linear->BN->ReLU->Linear->BN->ReLU
            # (reference `run_graphcount.py:230-236`); plain BN over edges.
            from escgnn_tpu.models.layers import MaskedBatchNorm

            for i in range(2):
                z = TorchDense(cfg.emb_dim, name=f"z_embedding_{i}")(z)
                z = MaskedBatchNorm(name=f"z_bn_{i}")(
                    z, batch.edge_mask, use_running_average
                )
                z = nn.relu(z)
            z = z * batch.edge_mask[:, None]
            edge_feat = jnp.concatenate(
                [batch.edge_mask[:, None].astype(z.dtype), z], axis=-1
            )
        else:
            edge_feat = batch.edge_mask[:, None].astype(jnp.float32)

        C_e = edge_feat.shape[-1]
        dense_edges = jnp.zeros((G, N, N, C_e), edge_feat.dtype)
        dense_edges = dense_edges.at[e_g, src_l, dst_l, :].add(edge_feat)

        # diagonal node channel (reference uses zeros for counting tasks)
        diag_ch = jnp.zeros((G, N, N, 1), edge_feat.dtype)
        x = jnp.concatenate([dense_edges, diag_ch], axis=-1)

        cdt = (
            jnp.bfloat16
            if cfg.compute_dtype == "bfloat16"
            else jnp.float32
        )
        pmask = _pair_mask(nm)
        x = (x * pmask).astype(cdt)
        for i in range(cfg.num_rb_layers):
            x = RegularBlock(
                cfg.emb_dim, cfg.depth_of_mlp,
                dtype=(cdt if cfg.compute_dtype == "bfloat16" else None),
                name=f"rb{i}",
            )(x, pmask)

        if cfg.node_level and cfg.pool_impl == "pallas":
            from escgnn_tpu.ops.ppgn_pool import diag_row_col_pool

            pooled = diag_row_col_pool(x)
        else:
            level = "node" if cfg.node_level else "graph"
            pooled = diag_offdiag_meanpool(x, nm, level=level)

        h = pooled
        h = nn.relu(TorchDense(cfg.emb_dim, name="fc0")(h))
        h = TorchDense(cfg.out_dim, name="fc1")(h)

        if cfg.node_level:
            # back to the sparse node list layout (N_batch, out)
            return h[batch.node_graph, batch.node_local]
        return h
