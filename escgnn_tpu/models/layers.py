"""Shared neural layers.

Parity notes vs the reference (torch / PyG):
  * `MaskedBatchNorm` excludes padding rows from batch statistics — with
    ragged torch batches every row is real, so masking is exactly what
    makes the padded TPU batches match (running stats follow torch
    conventions: biased variance for normalization, unbiased for the
    running update, momentum 0.1).
  * `GINEConv` implements PyG's GINEConv with `train_eps=True` and an
    `edge_dim -> in_channels` projection:
        out = mlp((1 + eps) * x + sum_{(j->i)} relu(x_j + lin(e_ji)))
    (PyG GINEConv.message / GINEConv.forward; used by the reference at
    e.g. `run_graphcount.py:77-109`). Aggregation is a masked sorted
    segment-sum instead of PyG's scatter.
  * Initializers match torch defaults so from-scratch training is
    comparable: Linear = kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    for both kernel and bias; Embedding = N(0, 1).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from escgnn_tpu.ops.segment import segment_sum


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """nn.Dense with torch nn.Linear's default initialization."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features)
        )
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param(
                "bias", torch_linear_bias_init(fan_in), (self.features,)
            )
            y = y + bias
        return y


class TorchEmbed(nn.Module):
    """nn.Embed (torch nn.Embedding N(0,1) init, same param name
    "embedding") with the one-hot-matmul backward of `ops/embed.py` —
    XLA's native gather transpose is a serial row scatter-add."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, ids):
        from escgnn_tpu.ops.embed import embed_take

        table = self.param(
            "embedding",
            nn.initializers.normal(1.0),
            (self.num_embeddings, self.features),
        )
        return embed_take(table, ids.astype(jnp.int32))


class EmbedMM(nn.Module):
    """Drop-in for nn.Embed (same param path `embedding`, configurable
    init) whose lookup goes through `ops.embed.embed_take`: the backward
    is a one-hot matmul on the MXU instead of XLA's serial per-row
    scatter-add (profiled ~45 us per table gradient on the molhiv step;
    the (G, M, M) SPD-bias table of the GPS stack is the largest id set
    fed through an embedding anywhere in the framework)."""

    num_embeddings: int
    features: int
    embedding_init: Callable = nn.initializers.normal(1.0)

    @nn.compact
    def __call__(self, ids):
        from escgnn_tpu.ops.embed import embed_take

        table = self.param(
            "embedding", self.embedding_init,
            (self.num_embeddings, self.features),
        )
        return embed_take(table, ids.astype(jnp.int32))


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over rows with a validity mask.

    Matches torch BatchNorm1d semantics: normalize with biased batch
    variance in training, update running stats with the unbiased variance,
    momentum 0.1, eps 1e-5, affine.

    `mask` may also be a float weight vector (row multiplicities): the
    statistics become weighted moments, which makes BN over deduplicated
    rows bit-equal to BN over the expanded row set (see the dedup z-emb
    path in models/nested_gin_eff.py).

    `axis_name`: when the row dimension is sharded over a mesh axis
    (edge-partitioned execution), batch statistics are psum-reduced over
    that axis so every shard normalizes with the global statistics.
    """

    # torch-style update fraction; train/loop.py's BN_MOMENTUM (the keep
    # fraction, 1 - momentum) must stay consistent with this default
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is None:
                m = jnp.ones((x.shape[0], 1), jnp.float32)
            else:
                m = mask.astype(jnp.float32)[:, None]
            s1 = jnp.sum(xf * m, axis=0)
            s2 = jnp.sum(xf * xf * m, axis=0)
            n = jnp.sum(m)
            if self.axis_name is not None:
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
                n = jax.lax.psum(n, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        # statistics and normalization run in f32; the activation leaves
        # in its input dtype so bf16 stacks stay bf16 between ops (the
        # f32 round-trip per BN was ~half the step's HBM traffic)
        return (y * scale + bias).astype(x.dtype)


class MLP(nn.Module):
    """The reference's Sequential pattern:
    [Linear -> Dropout -> BN -> act] per hidden layer.

    `pre_act=True` prepends Dropout -> BN -> act before the first Linear
    (the z_embedding head shape, reference `run_graphcount.py:54-61`).
    """

    features: Sequence[int]
    dropout: float = 0.0
    act: Callable = nn.relu
    pre_act: bool = False
    axis_name: Optional[str] = None  # rows sharded over this mesh axis

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool, use_running_average: bool):
        def block_tail(h):
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = MaskedBatchNorm(axis_name=self.axis_name)(
                h, mask, use_running_average
            )
            return self.act(h)

        if self.pre_act:
            x = block_tail(x)
        for f in self.features:
            x = TorchDense(f)(x)
            x = block_tail(x)
        return x


def _dense_local_aggregate(x, senders, receivers, edge_emb, edge_mask, n_u):
    """GINE aggregation on the uniform per-graph layout.

    The batched supergraph is block-diagonal: graph g's edges only touch
    its own n_u node slots. With every graph padded to an identical
    (n_u, e_u) block (data/batching.py `BatchSpec.uniform`), gather and
    scatter become per-graph one-hot einsums — small batched matmuls the
    MXU streams, instead of a global XLA scatter over all N rows.
    At equal shapes the aggregation alone is ~2.5x faster fwd / ~3x bwd
    than take+segment_sum on the chip (tools/conv_bench.py). End to end
    (scan-timed on device) it wins despite ~23% extra padded rows on the
    mixed-size ZINC bench batch: 2.67 vs 3.23 ms/step vs exact packing.
    The win grows when per-graph (n, e) variance is low. Opt in via
    BatchSpec.uniform (the flagship bench and the ZINC driver use it).
    """
    N, H = x.shape
    E = senders.shape[0]
    G = N // n_u
    e_u = E // G
    assert G * n_u == N and G * e_u == E, (N, E, n_u, e_u)
    cdt = x.dtype
    send_l = (senders % n_u).reshape(G, e_u)
    recv_l = (receivers % n_u).reshape(G, e_u)
    ar = jnp.arange(n_u, dtype=senders.dtype)
    oh_s = (send_l[:, :, None] == ar[None, None, :]).astype(cdt)
    gathered = jnp.einsum(
        "gen,gnh->geh", oh_s, x.reshape(G, n_u, H),
        preferred_element_type=jnp.float32,
    ).astype(cdt)
    msg = nn.relu(gathered + edge_emb.reshape(G, e_u, H))
    # mask padding edges on the scatter side (their one-hot row -> 0)
    oh_r = (recv_l[:, :, None] == ar[None, None, :]).astype(cdt)
    oh_r = oh_r * edge_mask.reshape(G, e_u, 1).astype(cdt)
    agg = jnp.einsum(
        "gen,geh->gnh", oh_r, msg, preferred_element_type=jnp.float32,
    )
    return agg.reshape(N, H).astype(cdt)


def _dense_local_scatter(msg, receivers, edge_mask, n_u, num_nodes):
    """Scatter-add per-edge messages to nodes on the uniform per-graph
    layout as per-graph one-hot einsums (the scatter half of
    `_dense_local_aggregate`, for convs whose gather side is irregular —
    e.g. GINE+'s distance-indexed history gather)."""
    E, H = msg.shape
    G = num_nodes // n_u
    e_u = E // G
    assert G * n_u == num_nodes and G * e_u == E, (num_nodes, E, n_u)
    recv_l = (receivers % n_u).reshape(G, e_u)
    ar = jnp.arange(n_u, dtype=receivers.dtype)
    oh_r = (recv_l[:, :, None] == ar[None, None, :]).astype(msg.dtype)
    oh_r = oh_r * edge_mask.reshape(G, e_u, 1).astype(msg.dtype)
    agg = jnp.einsum(
        "gen,geh->gnh", oh_r, msg.reshape(G, e_u, H),
        preferred_element_type=jnp.float32,
    )
    return agg.reshape(num_nodes, H).astype(msg.dtype)


def _dense_local_aggregate_regions(
    x, senders, receivers, edge_emb, edge_mask, regions
):
    """`_dense_local_aggregate` over the two-size bucketed copy layout
    (GraphBatch.seg_regions): the node/edge arrays are [small region ‖
    large region]; each region is itself a uniform block layout, so the
    same one-hot einsum runs per region (two MXU dispatches instead of
    one, against ~1.5x fewer padded edge slots — the round-4 identified
    lever on the copy family, BASELINE.md)."""
    (cs, n_s, e_s), (cl, n_l, e_l) = regions
    outs = []
    n_off = e_off = 0
    for c, n_u, e_u in ((cs, n_s, e_s), (cl, n_l, e_l)):
        if c == 0:
            continue
        ne, ee = c * n_u, c * e_u
        outs.append(_dense_local_aggregate(
            x[n_off:n_off + ne],
            senders[e_off:e_off + ee] - n_off,
            receivers[e_off:e_off + ee] - n_off,
            edge_emb[e_off:e_off + ee],
            edge_mask[e_off:e_off + ee],
            n_u,
        ))
        n_off += ne
        e_off += ee
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


class GINEConv(nn.Module):
    """PyG-semantics GINEConv over a padded edge list (see module docstring).

    `edge_shard_axis`: when edges are sharded over a mesh axis (nodes
    replicated), each shard aggregates its local edges and the partial
    node sums are psum-combined over ICI — the edge-partitioned execution
    of the message passing.
    """

    mlp: nn.Module
    edge_dim: Optional[int] = None  # project edge features to in_channels
    edge_shard_axis: Optional[str] = None
    # receiver-range node+edge sharding (parallel/halo.py): x holds only
    # this shard's node rows; remote sender rows arrive via one boundary
    # all_gather per layer (`halo_ctx` = {boundary_send, halo_src}) and
    # the per-node aggregation stays a LOCAL sorted segment-sum — no
    # per-layer psum, contrast edge_shard_axis
    halo_axis: Optional[str] = None
    # uniform per-graph layout (batch.nodes_per_graph): gather/scatter run
    # as per-graph one-hot einsums on the MXU (see _dense_local_aggregate
    # for when this wins; opt-in via BatchSpec.uniform)
    uniform_nodes: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x,
        senders,
        receivers,
        edge_emb,
        edge_mask,
        node_mask=None,
        *,
        deterministic: bool,
        use_running_average: bool,
        halo_ctx: Optional[dict] = None,
    ):
        in_ch = x.shape[-1]
        eps = self.param("eps", nn.initializers.zeros, ())
        if self.edge_dim is not None:
            edge_emb = TorchDense(in_ch, name="lin_edge")(edge_emb)
        if self.halo_axis is not None:
            from escgnn_tpu.parallel.halo import halo_exchange

            halo = halo_exchange(
                x, halo_ctx["boundary_send"], halo_ctx["halo_src"],
                self.halo_axis,
            )
            msg = nn.relu(
                jnp.take(jnp.concatenate([x, halo], axis=0), senders, axis=0)
                + edge_emb
            )
            agg = segment_sum(
                msg,
                receivers,
                num_segments=x.shape[0],
                mask=edge_mask,
                indices_are_sorted=True,
            )
        elif self.uniform_nodes is not None and self.edge_shard_axis is None:
            agg = _dense_local_aggregate(
                x, senders, receivers, edge_emb, edge_mask,
                self.uniform_nodes,
            )
        else:
            msg = nn.relu(jnp.take(x, senders, axis=0) + edge_emb)
            agg = segment_sum(
                msg,
                receivers,
                num_segments=x.shape[0],
                mask=edge_mask,
                indices_are_sorted=True,
            )
        if self.edge_shard_axis is not None:
            agg = jax.lax.psum(agg, self.edge_shard_axis)
        out = (1.0 + eps) * x + agg
        return self.mlp(
            out,
            node_mask,
            deterministic=deterministic,
            use_running_average=use_running_average,
        )
