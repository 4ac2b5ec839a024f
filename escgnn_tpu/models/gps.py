"""GPS — general, powerful, scalable graph transformer with ESC injection.

Capability mirror of the reference's GraphGPS fork
(`GraphGPS/graphgps/layer/gps_layer.py:140-270`): each layer runs a local
GINE MPNN and a global multi-head attention in parallel over the same
hidden state, sums them, and applies a feed-forward block — with the ESC
per-edge structural embedding *added to the edge features at every layer*
(`gps_layer.py:185-188`), and optional Graphormer-style SPD attention
bias (`BiasedTransformer`; bias built by
`loader/utils_escgnn.py:28-39`).

TPU design: the dense attention runs per graph over a
(G, M, D) scatter of the node states (M = per-graph node budget) with
key-padding masks; the SPD bias is a per-head embedding of the dense
(G, M, M) distance-bucket matrix from the batcher.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import (
    EmbedMM,
    MLP,
    MaskedBatchNorm,
    TorchDense,
)
from escgnn_tpu.ops.segment import segment_sum
from escgnn_tpu.ops.zemb import (
    expand_rows,
    zemb_from_batch,
    zemb_unique_rows,
)


@dataclasses.dataclass(frozen=True)
class GPSConfig:
    dim_h: int = 64
    num_layers: int = 4
    num_heads: int = 4
    dropout: float = 0.0
    attn_dropout: float = 0.0
    local_model: str = "gine"  # gine | gatedgcn | pna (gps_layer.py local zoo)
    global_model: str = "transformer"  # transformer | linear (Performer) | bigbird
    # BigBird pattern knobs (block-sparse attention, Zaheer et al.; the
    # reference's BigBird option `gps_layer.py:98-109`). Graphs here are
    # tiny (M <= a few dozen), so the TPU-fast implementation is the
    # dense masked form of the same pattern, not gather-based blocks.
    bigbird_window: int = 3  # sliding-window radius in node-index order
    bigbird_global: int = 2  # first g tokens per graph are global
    bigbird_random: int = 2  # deterministic pseudo-random extra keys/query
    pna_towers: int = 4  # towers for the pna local model
    avg_deg_log: float = 1.0  # E[log(1+deg)] for pna scalers
    use_esc: bool = True  # inject ESC edge encoding every layer
    use_attn_bias: bool = False  # Graphormer-style SPD bias
    spd_vocab: int = 102  # cap 100 + unreachable + 0
    # node positional encoders (GraphGPS encoder zoo, graphgps/encoder/*):
    # extras produced by featurize/posenc.py are projected and added to
    # the node state before layer 0.
    use_lap_pe: bool = False  # extras["lap_pe"] -> linear (LapPE/SignNet-lite)
    # full SignNet encoder (Lim et al.; reference
    # graphgps/encoder/signnet_pos_encoder.py): per-eigenvector DeepSets
    # phi(v, lambda) + phi(-v, lambda) -> rho; strictly sign-invariant
    use_signnet: bool = False
    signnet_phi_dim: int = 16
    use_rwse: bool = False  # extras["rwse"] -> linear (RWSE)
    use_degree: bool = False  # extras["degree"] -> Embed (Graphormer degree)
    # input featurization (the master_loader dataset zoo spans int-vocab
    # molecules, float-feature counting graphs, and continuous QM9 bonds):
    # embed = int vocab (first column); linear = Dense on float features;
    # none (edges only) = learned constant edge embedding;
    # ogb_atom/ogb_bond = per-column embedding sums over the OGB vocabs
    # embed | linear | ogb_atom | ppa_uniform | ast
    node_encoder_kind: str = "embed"
    edge_encoder_kind: str = "embed"  # embed | linear | none | ogb_bond
    # AST encoder vocab sizes (ogbg-code2, encoder/ast_encoder.py)
    ast_type_vocab: int = 100
    ast_depth_vocab: int = 21
    # SAN global attention (global_model="san"): fake-edge weight gamma
    # and whether the complement term is used at all
    san_gamma: float = 1e-5
    san_full_graph: bool = True
    # FAVOR+ Performer (global_model="performer"): number of random
    # features of the positive softmax-kernel map (Choromanski et al.;
    # reference layer/performer_layer.py). "linear" remains the elu+1
    # linear-attention stand-in.
    performer_features: int = 64
    # EquivStableLapPE (reference encoder/equivstable_laplace_pos_encoder
    # .py + gatedgcn_layer.py:99-106): encode raw Laplacian eigvecs to a
    # d-dim PE and scale every GatedGCN message gate by
    # sigmoid(MLP(||pe_i - pe_j||^2)) — requires local_model="gatedgcn"
    # and extras["lap_pe"]
    use_equivstable_pe: bool = False
    degree_vocab: int = 64
    node_vocab: int = 100
    edge_vocab: int = 100
    z_dim: int = 1800
    graph_pred: bool = True
    pool: str = "add"
    out_dim: int = 1
    # prediction head: "default" = pooled/node MLP head;
    # "inductive_edge" = the link-prediction head (reference
    # GraphGPS/graphgps/head/inductive_edge.py:20-56, dot decoding):
    # a post-MP MLP on NODE states, returned as (N, dim_h) embeddings —
    # pair scoring (dot product on pair_index gathers) lives in the
    # link loss / MRR metrics so the same forward serves training
    # (sampled pairs) and ranking eval (all-pairs X @ X^T per graph)
    head: str = "default"


def _bigbird_mask(m: int, window: int, num_global: int, num_random: int):
    """Static (M, M) BigBird attendability mask: sliding window in
    node-index order + global first tokens + deterministic pseudo-random
    extra keys (fixed odd-stride pattern — keeps the mask a compile-time
    constant; the reference's BigBird samples random blocks once at init).
    """
    i = jnp.arange(m)[:, None]
    j = jnp.arange(m)[None, :]
    mask = jnp.abs(i - j) <= window
    mask = mask | (i < num_global) | (j < num_global)
    for r in range(num_random):
        # odd strides are coprime with any power-of-two M -> distinct keys
        stride = 2 * r + 3
        mask = mask | (j == (i * stride + r) % m)
    return mask  # (M, M) bool


class DenseAttention(nn.Module):
    """Per-graph multi-head attention over scattered dense node states.

    `pattern="bigbird"` applies the BigBird block-sparse attendability
    mask (window ‖ global ‖ random) to the same dense logits — on the
    molecule-scale graphs of this workload the masked dense form is
    faster on the MXU than any gather-based sparse realization.
    """

    dim_h: int
    num_heads: int
    use_bias: bool
    spd_vocab: int
    pattern: str = "full"  # full | bigbird
    window: int = 3
    num_global: int = 2
    num_random: int = 2

    @nn.compact
    def __call__(self, h, batch: GraphBatch, *, deterministic: bool):
        G = batch.num_graphs
        # static per-graph dense budget M: from the attn_bias matrix when
        # the batcher produced one, else the explicit dense_m extra
        M = None
        if batch.extras:
            if "attn_bias" in batch.extras:
                M = batch.extras["attn_bias"].shape[1]
            elif "dense_m" in batch.extras:
                M = int(batch.extras["dense_m"])
        assert M is not None, "GPS attention needs the dense budget (attn_bias)"
        D, Hh = self.dim_h, self.num_heads
        hd = D // Hh

        dense = jnp.zeros((G, M, D), h.dtype)
        dense = dense.at[batch.node_graph, batch.node_local].set(
            jnp.where(batch.node_mask[:, None], h, 0.0)
        )
        key_mask = jnp.zeros((G, M), bool).at[
            batch.node_graph, batch.node_local
        ].set(batch.node_mask)

        q = TorchDense(D, name="q")(dense).reshape(G, M, Hh, hd)
        k = TorchDense(D, name="k")(dense).reshape(G, M, Hh, hd)
        v = TorchDense(D, name="v")(dense).reshape(G, M, Hh, hd)
        logits = jnp.einsum(
            "gmhd,gnhd->ghmn", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(hd)
        if self.use_bias:
            spd = batch.extras["attn_bias"].astype(jnp.int32)
            bias = EmbedMM(
                self.spd_vocab, Hh,
                embedding_init=nn.initializers.normal(0.02),
                name="spd_bias",
            )(jnp.clip(spd, 0, self.spd_vocab - 1))  # (G, M, M, Hh)
            logits = logits + jnp.transpose(bias, (0, 3, 1, 2))
        logits = jnp.where(
            key_mask[:, None, None, :], logits, jnp.finfo(jnp.float32).min
        )
        if self.pattern == "bigbird":
            bb = _bigbird_mask(M, self.window, self.num_global, self.num_random)
            logits = jnp.where(
                bb[None, None, :, :], logits, jnp.finfo(jnp.float32).min
            )
        attn = jax.nn.softmax(logits, axis=-1)
        # exposed for the attention-dump inference mode (reference
        # custom_train.py:317); a no-op unless the caller makes the
        # "intermediates" collection mutable
        self.sow("intermediates", "attn_weights", attn)
        out = jnp.einsum(
            "ghmn,gnhd->gmhd", attn, v, preferred_element_type=jnp.float32
        ).reshape(G, M, D)
        out = TorchDense(D, name="out")(out)
        # back to the sparse node list
        return out[batch.node_graph, batch.node_local]


class SANAttention(nn.Module):
    """SAN multi-head attention (reference
    `GraphGPS/graphgps/layer/san_layer.py:10-121`): real edges score
    Q·K·E per head over the sparse edge list; with `full_graph`, FAKE
    (complement) edges score Q2·K2·E2 with one shared fake-edge
    embedding, mixed as 1/(gamma+1) real + gamma/(gamma+1) fake and
    normalized per destination.

    TPU design: the reference materializes the complement edge list
    (dynamic size); here the fake-edge term is computed densely on the
    (G, M, M) pair grid with a static mask (real pairs, self-loops and
    padding excluded) — same math, static shapes.
    """

    dim_h: int
    num_heads: int
    gamma: float = 1e-5
    full_graph: bool = True

    @nn.compact
    def __call__(self, h, edge_attr, batch: GraphBatch, *,
                 deterministic: bool):
        G = batch.num_graphs
        D, Hh = self.dim_h, self.num_heads
        hd = D // Hh
        N = h.shape[0]

        def proj(name):
            return TorchDense(D, name=name)

        q = proj("q")(h).reshape(N, Hh, hd)
        k = proj("k")(h).reshape(N, Hh, hd)
        v = proj("v")(h).reshape(N, Hh, hd)
        e = proj("e")(edge_attr).reshape(-1, Hh, hd)

        # real-edge scores: exp(clamp(sum_d K[src] Q[dst] E / sqrt(d)))
        s = jnp.sum(
            jnp.take(k, batch.senders, axis=0)
            * jnp.take(q, batch.receivers, axis=0) * e,
            axis=-1,
        ) / jnp.sqrt(float(hd))
        s = jnp.exp(jnp.clip(s, -5.0, 5.0))  # (E, Hh)
        s = s * batch.edge_mask[:, None]
        if self.full_graph:
            s = s / (self.gamma + 1.0)
        msg = jnp.take(v, batch.senders, axis=0) * s[..., None]
        wV = segment_sum(
            msg.reshape(-1, Hh * hd), batch.receivers, N,
            mask=batch.edge_mask, indices_are_sorted=True,
        ).reshape(N, Hh, hd)
        Z = segment_sum(
            s, batch.receivers, N, mask=batch.edge_mask,
            indices_are_sorted=True,
        )  # (N, Hh)

        if self.full_graph:
            # static per-graph dense budget, same sources as
            # DenseAttention: explicit (attn_bias / dense_m extras) or
            # the uniform-layout block size; ceil(N/G) as the last
            # resort (valid for from_graphs/uniform specs which pad N to
            # G * max_nodes_per_graph — exact-packed batches must carry
            # dense_m or node_local may exceed the guess)
            ex = batch.extras or {}
            if "attn_bias" in ex:
                M = ex["attn_bias"].shape[1]
            elif "dense_m" in ex:
                M = int(ex["dense_m"])
            elif batch.nodes_per_graph:
                M = int(batch.nodes_per_graph)
            else:
                M = max(-(-N // max(G, 1)), 1)
            q2 = proj("q2")(h).reshape(N, Hh, hd)
            k2 = proj("k2")(h).reshape(N, Hh, hd)
            fake = self.param(
                "fake_edge_emb", nn.initializers.normal(1.0), (D,)
            )
            e2 = proj("e2")(fake).reshape(Hh, hd)

            def dense(x):
                out = jnp.zeros((G, M, Hh, hd), x.dtype)
                return out.at[batch.node_graph, batch.node_local].set(
                    jnp.where(batch.node_mask[:, None, None], x, 0.0)
                )

            dq2, dk2, dv = dense(q2), dense(k2), dense(v)
            # s2[g, h, src m, dst n]
            s2 = jnp.einsum(
                "gmhd,gnhd,hd->ghmn", dk2, dq2, e2,
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(float(hd))
            s2 = jnp.exp(jnp.clip(s2, -5.0, 5.0)) * (
                self.gamma / (self.gamma + 1.0)
            )
            # fake-pair mask: both real, not self, not a real edge
            nmask = jnp.zeros((G, M), bool).at[
                batch.node_graph, batch.node_local
            ].set(batch.node_mask)
            pair = nmask[:, :, None] & nmask[:, None, :]
            pair &= ~jnp.eye(M, dtype=bool)[None]
            e_g = jnp.take(batch.node_graph, batch.receivers)
            src_l = jnp.take(batch.node_local, batch.senders)
            dst_l = jnp.take(batch.node_local, batch.receivers)
            real = jnp.zeros((G, M, M), bool).at[e_g, src_l, dst_l].set(
                batch.edge_mask
            )
            s2 = jnp.where((pair & ~real)[:, None], s2, 0.0)
            wV2 = jnp.einsum(
                "ghmn,gmhd->gnhd", s2, dv,
                preferred_element_type=jnp.float32,
            )
            Z2 = jnp.sum(s2, axis=2)  # (G, Hh, n)
            wV = wV + wV2[batch.node_graph, batch.node_local]
            Z = Z + jnp.transpose(Z2, (0, 2, 1))[
                batch.node_graph, batch.node_local
            ]

        out = wV / (Z[..., None] + 1e-6)
        return out.reshape(N, D)


class GatedGCNConv(nn.Module):
    """Edge-gated graph conv (Bresson & Laurent; the reference's GatedGCN
    local-model option, `gps_layer.py:60-75`):
      e'_ij = A x_i + B x_j + C e_ij;  gate = sigmoid(e'_ij)
      h'_i = U x_i + sum_j gate ⊙ (V x_j) / (sum_j gate + eps)
    Returns (h', e') — the edge state threads through the layers.

    `pe` (optional, (N, F)): EquivStableLapPE message stabilization
    (reference `gatedgcn_layer.py:99-106`): gate *=
    sigmoid(MLP(||pe_i - pe_j||^2))."""

    features: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask,
                 pe=None):
        n = x.shape[0]
        D = self.features
        e = (
            TorchDense(D, name="A")(jnp.take(x, receivers, axis=0))
            + TorchDense(D, name="B")(jnp.take(x, senders, axis=0))
            + TorchDense(D, name="C")(edge_attr)
        )
        gate = jax.nn.sigmoid(e) * edge_mask[:, None]
        if pe is not None:
            r = jnp.sum(
                (jnp.take(pe, receivers, axis=0)
                 - jnp.take(pe, senders, axis=0)) ** 2,
                axis=-1, keepdims=True,
            )
            r = TorchDense(D, name="r_mlp1")(r)
            r = jax.nn.sigmoid(TorchDense(1, name="r_mlp2")(nn.relu(r)))
            gate = gate * r
        v = TorchDense(D, name="V")(x)
        num = segment_sum(
            gate * jnp.take(v, senders, axis=0), receivers, n,
            indices_are_sorted=True,
        )
        den = segment_sum(gate, receivers, n, indices_are_sorted=True)
        h = TorchDense(D, name="U")(x) + num / (den + 1e-6)
        return h, e


class LinearAttention(nn.Module):
    """Masked linear (Performer-style) global attention: the elu+1
    feature map of Katharopoulos et al., O(N d^2) per graph — the
    reference's Performer option role (`gps_layer.py:86-96`), implemented
    with segment reductions instead of dense (G, M, M) logits."""

    dim_h: int
    num_heads: int

    @nn.compact
    def __call__(self, h, batch: GraphBatch, *, deterministic: bool):
        D, Hh = self.dim_h, self.num_heads
        hd = D // Hh
        n = h.shape[0]
        G = batch.num_graphs
        q = TorchDense(D, name="q")(h).reshape(n, Hh, hd)
        k = TorchDense(D, name="k")(h).reshape(n, Hh, hd)
        v = TorchDense(D, name="v")(h).reshape(n, Hh, hd)
        qf = nn.elu(q) + 1.0
        kf = (nn.elu(k) + 1.0) * batch.node_mask[:, None, None]
        # per-graph sums: KV (G, Hh, hd, hd) and K (G, Hh, hd)
        kv = segment_sum(
            (kf[:, :, :, None] * v[:, :, None, :]).reshape(n, -1),
            batch.node_graph, G, mask=batch.node_mask,
        ).reshape(G, Hh, hd, hd)
        ksum = segment_sum(
            kf.reshape(n, -1), batch.node_graph, G, mask=batch.node_mask
        ).reshape(G, Hh, hd)
        kv_n = jnp.take(kv, batch.node_graph, axis=0)  # (N, Hh, hd, hd)
        ks_n = jnp.take(ksum, batch.node_graph, axis=0)
        num = jnp.einsum("nhd,nhde->nhe", qf, kv_n)
        den = jnp.maximum(jnp.einsum("nhd,nhd->nh", qf, ks_n), 1e-6)
        out = (num / den[..., None]).reshape(n, D)
        return TorchDense(D, name="out")(out)


def _favor_projection(num_features: int, head_dim: int) -> jnp.ndarray:
    """Orthogonal random-feature matrix of FAVOR+ (blocks of QR'd
    Gaussians with chi-distributed row norms). Derived from a FIXED key:
    the features are non-trainable constants, so the map is identical
    every call (the reference redraws periodically; a fixed draw is the
    deterministic special case)."""
    key = jax.random.key(0x5EED)
    blocks = []
    remaining = num_features
    i = 0
    while remaining > 0:
        g = jax.random.normal(
            jax.random.fold_in(key, i), (head_dim, head_dim)
        )
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T[: min(remaining, head_dim)])
        remaining -= head_dim
        i += 1
    W = jnp.concatenate(blocks, axis=0)  # (m, hd)
    norms = jnp.sqrt(jax.random.chisquare(
        jax.random.fold_in(key, 999), head_dim, (W.shape[0],)
    ))
    return W * norms[:, None]


class FavorAttention(nn.Module):
    """FAVOR+ Performer attention (Choromanski et al.; the reference's
    true Performer option, `layer/performer_layer.py`): the softmax
    kernel exp(q·k/sqrt(d)) is estimated with positive orthogonal random
    features phi(x) = exp(W x' - ||x'||^2/2 - c)/sqrt(m) (x' = x/d^{1/4},
    c a per-row stabilizer), giving O(N m d) attention via the same
    per-graph prefix sums as linear attention — no (M, M) logits."""

    dim_h: int
    num_heads: int
    num_features: int = 64

    @nn.compact
    def __call__(self, h, batch: GraphBatch, *, deterministic: bool):
        D, Hh = self.dim_h, self.num_heads
        hd = D // Hh
        n = h.shape[0]
        G = batch.num_graphs
        q = TorchDense(D, name="q")(h).reshape(n, Hh, hd)
        k = TorchDense(D, name="k")(h).reshape(n, Hh, hd)
        v = TorchDense(D, name="v")(h).reshape(n, Hh, hd)
        W = _favor_projection(self.num_features, hd)  # (m, hd)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(float(hd)))
        qs, ks = q * scale, k * scale

        def phi(x, stab):
            wx = jnp.einsum("nhd,md->nhm", x, W)
            sq = 0.5 * jnp.sum(x * x, axis=-1, keepdims=True)
            return jnp.exp(wx - sq - stab) / jnp.sqrt(float(W.shape[0]))

        # per-row stabilizers keep the exponentials bounded; they cancel
        # in the normalized attention (num and den share the q factor,
        # and the k stabilizer is per-graph constant after masking)
        q_stab = jnp.max(
            jnp.einsum("nhd,md->nhm", qs, W), axis=-1, keepdims=True
        )
        k_stab = jnp.max(jnp.einsum("nhd,md->nhm", ks, W))
        qf = phi(qs, q_stab)
        kf = phi(ks, k_stab) * batch.node_mask[:, None, None]
        m = W.shape[0]
        kv = segment_sum(
            (kf[:, :, :, None] * v[:, :, None, :]).reshape(n, -1),
            batch.node_graph, G, mask=batch.node_mask,
        ).reshape(G, Hh, m, hd)
        ksum = segment_sum(
            kf.reshape(n, -1), batch.node_graph, G, mask=batch.node_mask
        ).reshape(G, Hh, m)
        kv_n = jnp.take(kv, batch.node_graph, axis=0)
        ks_n = jnp.take(ksum, batch.node_graph, axis=0)
        num = jnp.einsum("nhm,nhmd->nhd", qf, kv_n)
        den = jnp.maximum(jnp.einsum("nhm,nhm->nh", qf, ks_n), 1e-9)
        out = (num / den[..., None]).reshape(n, D)
        return TorchDense(D, name="out")(out)


class SAN2Attention(nn.Module):
    """SAN2 multi-head attention (reference `layer/san2_layer.py`):
    unlike SAN, real- and fake-edge scores are softmax-NORMALIZED per
    destination separately (score minus per-destination max, exp,
    divide by per-destination sum), mixed with a LEARNABLE scalar gamma
    (init 0.5) as 1/(gamma+1) real + gamma/(gamma+1) fake, and the
    output is wV directly (no joint Z). Fake edges run on the dense
    (G, M, M) complement grid with static masks (same TPU design as
    SANAttention)."""

    dim_h: int
    num_heads: int
    full_graph: bool = True

    @nn.compact
    def __call__(self, h, edge_attr, batch: GraphBatch, *,
                 deterministic: bool):
        from escgnn_tpu.ops.segment import segment_softmax

        G = batch.num_graphs
        D, Hh = self.dim_h, self.num_heads
        hd = D // Hh
        N = h.shape[0]
        gamma = self.param(
            "gamma", lambda *_: jnp.asarray(0.5, jnp.float32), ()
        )

        def proj(name):
            return TorchDense(D, name=name)

        q = proj("q")(h).reshape(N, Hh, hd)
        k = proj("k")(h).reshape(N, Hh, hd)
        v = proj("v")(h).reshape(N, Hh, hd)
        e = proj("e")(edge_attr).reshape(-1, Hh, hd)

        s = jnp.sum(
            jnp.take(k, batch.senders, axis=0)
            * jnp.take(q, batch.receivers, axis=0) * e,
            axis=-1,
        ) / jnp.sqrt(float(hd))  # (E, Hh)
        # per-destination softmax over incoming REAL edges
        attn = segment_softmax(
            s, batch.receivers, N, mask=batch.edge_mask,
            indices_are_sorted=True,
        )
        wV = segment_sum(
            (jnp.take(v, batch.senders, axis=0)
             * attn[..., None]).reshape(-1, Hh * hd),
            batch.receivers, N, mask=batch.edge_mask,
            indices_are_sorted=True,
        ).reshape(N, Hh, hd)

        if self.full_graph:
            ex = batch.extras or {}
            if "attn_bias" in ex:
                M = ex["attn_bias"].shape[1]
            elif "dense_m" in ex:
                M = int(ex["dense_m"])
            elif batch.nodes_per_graph:
                M = int(batch.nodes_per_graph)
            else:
                M = max(-(-N // max(G, 1)), 1)
            q2 = proj("q2")(h).reshape(N, Hh, hd)
            k2 = proj("k2")(h).reshape(N, Hh, hd)
            fake = self.param(
                "fake_edge_emb", nn.initializers.normal(1.0), (D,)
            )
            e2 = proj("e2")(fake).reshape(Hh, hd)

            def dense(x):
                out = jnp.zeros((G, M, Hh, hd), x.dtype)
                return out.at[batch.node_graph, batch.node_local].set(
                    jnp.where(batch.node_mask[:, None, None], x, 0.0)
                )

            dq2, dk2, dv = dense(q2), dense(k2), dense(v)
            s2 = jnp.einsum(
                "gmhd,gnhd,hd->ghmn", dk2, dq2, e2,
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(float(hd))
            nmask = jnp.zeros((G, M), bool).at[
                batch.node_graph, batch.node_local
            ].set(batch.node_mask)
            pair = nmask[:, :, None] & nmask[:, None, :]
            pair &= ~jnp.eye(M, dtype=bool)[None]
            e_g = jnp.take(batch.node_graph, batch.receivers)
            src_l = jnp.take(batch.node_local, batch.senders)
            dst_l = jnp.take(batch.node_local, batch.receivers)
            real = jnp.zeros((G, M, M), bool).at[e_g, src_l, dst_l].set(
                batch.edge_mask
            )
            fmask = (pair & ~real)[:, None]  # (G, 1, M src, M dst)
            # per-destination softmax over FAKE sources (axis 2 = src).
            # Finite fill instead of -inf: a destination whose every pair
            # is real has an EMPTY fake set, and -inf - -inf = NaN would
            # poison gradients through the where
            neg = jnp.finfo(jnp.float32).min
            s2m = jnp.where(fmask, s2, neg)
            mx = jnp.max(s2m, axis=2, keepdims=True)
            mx = jnp.where(mx <= neg, 0.0, mx)
            # exp on the FILLED scores: a masked entry can exceed the
            # fake-only max, and exp would overflow before the where
            s2 = jnp.where(fmask, jnp.exp(s2m - mx), 0.0)
            s2 = s2 / (jnp.sum(s2, axis=2, keepdims=True) + 1e-16)
            wV2 = jnp.einsum(
                "ghmn,gmhd->gnhd", s2, dv,
                preferred_element_type=jnp.float32,
            )[batch.node_graph, batch.node_local]
            wV = wV / (gamma + 1.0) + wV2 * (gamma / (gamma + 1.0))

        return wV.reshape(N, D)


class GPSLayer(nn.Module):
    cfg: GPSConfig

    @nn.compact
    def __call__(
        self, h, edge_attr, batch: GraphBatch,
        *, deterministic: bool, use_running_average: bool,
    ):
        cfg = self.cfg
        D = cfg.dim_h
        kw = dict(
            deterministic=deterministic, use_running_average=use_running_average
        )

        if cfg.global_model == "graphormer":
            # Graphormer v1 block (reference layer/graphormer_layer.py):
            # pre-LN MHA with the SPD spatial bias (+ degree encoder at
            # the model input), then LN -> Linear -> GELU -> Dropout ->
            # Linear residual MLP. No local MPNN — the whole layer is the
            # transformer block.
            x = nn.LayerNorm(name="input_norm")(h)
            x = DenseAttention(
                D, cfg.num_heads, True, cfg.spd_vocab, name="self_attn"
            )(x, batch, deterministic=deterministic)
            x = nn.Dropout(cfg.dropout, deterministic=deterministic)(x) + h
            ff = nn.LayerNorm(name="mlp_norm")(x)
            ff = nn.gelu(TorchDense(D, name="mlp_1")(ff))
            ff = nn.Dropout(cfg.dropout, deterministic=deterministic)(ff)
            ff = TorchDense(D, name="mlp_2")(ff)
            ff = nn.Dropout(cfg.dropout, deterministic=deterministic)(ff)
            return x + ff, edge_attr

        # ESC structural encoding added to the edge features each layer
        if cfg.use_esc and (batch.enc_idx is not None or batch.enc_flat_idx is not None):
            z_table = self.param(
                "z_initial", nn.initializers.normal(1.0), (cfg.z_dim, D)
            )
            z_mlp = MLP(
                features=(D,), dropout=cfg.dropout, act=nn.elu, pre_act=True,
                name="z_embedding",
            )
            # dedup layout, no dropout: z MLP on unique encoding rows
            # with multiplicity-weighted BN, one expand to edges — the
            # flagship recipe (models/nested_gin_eff.py)
            u = zemb_unique_rows(z_table, batch) if cfg.dropout == 0.0 else None
            if u is not None and getattr(batch, "enc_row_weight", None) is not None:
                u = z_mlp(u, batch.enc_row_weight, **kw)
                z = expand_rows(u, batch)
            else:
                z = zemb_from_batch(z_table, batch)
                z = z_mlp(z, batch.edge_mask, **kw)
            edge_attr = edge_attr + z

        # local MPNN (gine | gatedgcn | pna — reference gps_layer.py local zoo)
        if cfg.local_model == "gatedgcn":
            es_pe = None
            if cfg.use_equivstable_pe:
                es_pe = (batch.extras or {}).get("equivstable_pe")
                assert es_pe is not None, (
                    "use_equivstable_pe needs the encoded lap_pe "
                    "(GPSModel attaches extras['equivstable_pe'])"
                )
            h_local, edge_attr = GatedGCNConv(D, name="local_gatedgcn")(
                h, batch.senders, batch.receivers, edge_attr,
                batch.edge_mask, pe=es_pe,
            )
        elif cfg.local_model == "pna":
            from escgnn_tpu.models.baselines import PNAConv

            h_local = PNAConv(
                D, towers=cfg.pna_towers, avg_deg_log=cfg.avg_deg_log,
                edge_dim=D, name="local_pna",
            )(h, batch.senders, batch.receivers, batch.edge_mask, edge_attr)
        else:
            from escgnn_tpu.models.layers import GINEConv

            h_local = GINEConv(
                mlp=MLP(features=(D, D), dropout=cfg.dropout, act=nn.relu),
                edge_dim=D,
                # uniform per-graph blocks: one-hot einsum aggregation
                # on the MXU (the flagship playbook; opt-in via
                # BatchSpec.uniform)
                uniform_nodes=getattr(batch, "nodes_per_graph", None),
                name="local_gine",
            )(
                h, batch.senders, batch.receivers, edge_attr, batch.edge_mask,
                batch.node_mask, **kw,
            )
        h_local = nn.Dropout(cfg.dropout, deterministic=deterministic)(h_local)
        h_local = h + h_local
        h_local = MaskedBatchNorm(name="norm1_local")(
            h_local, batch.node_mask, use_running_average
        )

        # global attention (dense transformer | linear Performer | bigbird
        # | SAN real+fake edge attention)
        if cfg.global_model == "linear":
            h_attn = LinearAttention(
                D, cfg.num_heads, name="self_attn"
            )(h, batch, deterministic=deterministic)
        elif cfg.global_model == "performer":
            h_attn = FavorAttention(
                D, cfg.num_heads, num_features=cfg.performer_features,
                name="self_attn",
            )(h, batch, deterministic=deterministic)
        elif cfg.global_model == "san2":
            h_attn = SAN2Attention(
                D, cfg.num_heads, full_graph=cfg.san_full_graph,
                name="self_attn",
            )(h, edge_attr, batch, deterministic=deterministic)
        elif cfg.global_model == "san":
            h_attn = SANAttention(
                D, cfg.num_heads, gamma=cfg.san_gamma,
                full_graph=cfg.san_full_graph, name="self_attn",
            )(h, edge_attr, batch, deterministic=deterministic)
        else:
            h_attn = DenseAttention(
                D, cfg.num_heads, cfg.use_attn_bias, cfg.spd_vocab,
                pattern=(
                    "bigbird" if cfg.global_model == "bigbird" else "full"
                ),
                window=cfg.bigbird_window,
                num_global=cfg.bigbird_global,
                num_random=cfg.bigbird_random,
                name="self_attn",
            )(h, batch, deterministic=deterministic)
        h_attn = nn.Dropout(cfg.dropout, deterministic=deterministic)(h_attn)
        h_attn = h + h_attn
        h_attn = MaskedBatchNorm(name="norm1_attn")(
            h_attn, batch.node_mask, use_running_average
        )

        h = h_local + h_attn

        # feed-forward
        ff = TorchDense(2 * D, name="ff_linear1")(h)
        ff = nn.relu(ff)
        ff = nn.Dropout(cfg.dropout, deterministic=deterministic)(ff)
        ff = TorchDense(D, name="ff_linear2")(ff)
        ff = nn.Dropout(cfg.dropout, deterministic=deterministic)(ff)
        h = h + ff
        h = MaskedBatchNorm(name="norm2")(
            h, batch.node_mask, use_running_average
        )
        return h, edge_attr


class GPSModel(nn.Module):
    cfg: GPSConfig

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        *,
        deterministic: bool = True,
        use_running_average: bool = True,
    ):
        cfg = self.cfg
        D = cfg.dim_h
        if cfg.node_encoder_kind == "linear":
            h = TorchDense(D, name="node_encoder")(
                batch.x.astype(jnp.float32)
            )
        elif cfg.node_encoder_kind == "ppa_uniform":
            # ogbg-ppa has no node features: one learned embedding row
            # for every node (reference `encoder/ppa_encoder.py`:
            # Embedding(1, emb_dim) on x = zeros)
            h = jnp.broadcast_to(
                self.param(
                    "node_const", nn.initializers.normal(1.0), (D,)
                ),
                (batch.num_nodes, D),
            )
        elif cfg.node_encoder_kind == "ast":
            # ogbg-code2 AST nodes: type embedding + depth embedding
            # (reference `encoder/ast_encoder.py` ASTNodeEncoder)
            xi = batch.x.astype(jnp.int32)
            h = EmbedMM(
                cfg.ast_type_vocab, D,
                embedding_init=nn.initializers.normal(1.0),
                name="ast_type_encoder",
            )(xi[:, 0]) + EmbedMM(
                cfg.ast_depth_vocab, D,
                embedding_init=nn.initializers.normal(1.0),
                name="ast_depth_encoder",
            )(jnp.clip(xi[:, 1], 0, cfg.ast_depth_vocab - 1))
        elif cfg.node_encoder_kind == "ogb_atom":
            # OGB 9-column categorical atom features: sum of per-column
            # embeddings (the AtomEncoder the reference injects for OGB
            # GPS runs, master_loader.py:380-397)
            from escgnn_tpu.models.ogb_gnn import (
                ATOM_FEATURE_DIMS,
                FeatureSumEncoder,
            )

            h = FeatureSumEncoder(
                ATOM_FEATURE_DIMS, D, name="node_encoder"
            )(batch.x)
        else:
            h = EmbedMM(
                cfg.node_vocab, D, embedding_init=nn.initializers.normal(1.0),
                name="node_encoder",
            )(batch.x.astype(jnp.int32).reshape(batch.x.shape[0]))
        ex = batch.extras or {}
        if cfg.use_lap_pe:
            # sign-invariance-lite: |v| and v both projected (cheap SignNet)
            pe = ex["lap_pe"].astype(jnp.float32)
            feats = jnp.concatenate([pe, jnp.abs(pe)], axis=-1)
            h = h + TorchDense(D, name="lap_pe_encoder")(feats)
        if cfg.use_signnet:
            pe = ex["lap_pe"].astype(jnp.float32)        # (N, K)
            ev = ex["lap_eigvals"].astype(jnp.float32)   # (N, K)
            F = cfg.signnet_phi_dim
            phi1 = TorchDense(F, name="signnet_phi1")
            phi2 = TorchDense(F, name="signnet_phi2")

            def phi(v):
                z = jnp.stack([v, ev], axis=-1)          # (N, K, 2)
                return phi2(nn.relu(phi1(z)))            # (N, K, F)

            z = phi(pe) + phi(-pe)                       # sign-invariant
            h = h + TorchDense(D, name="signnet_rho")(
                z.reshape(z.shape[0], -1)
            )
        if cfg.use_rwse:
            h = h + TorchDense(D, name="rwse_encoder")(
                ex["rwse"].astype(jnp.float32)
            )
        if cfg.use_degree:
            h = h + EmbedMM(
                cfg.degree_vocab, D,
                embedding_init=nn.initializers.normal(0.02),
                name="degree_encoder",
            )(ex["degree"].astype(jnp.int32).reshape(-1))
        if cfg.use_equivstable_pe:
            # EquivStableLapPE (reference equivstable_laplace_pos_encoder
            # .py): linear-encode the raw eigvecs; the GatedGCN local
            # model reads it per layer for message stabilization
            es = TorchDense(D, name="equivstable_pe_encoder")(
                ex["lap_pe"].astype(jnp.float32)
            )
            batch = batch.replace(extras={**ex, "equivstable_pe": es})
        if cfg.edge_encoder_kind == "none":
            # edge-featureless datasets (counting): one learned embedding
            edge_attr = jnp.broadcast_to(
                self.param("edge_const", nn.initializers.normal(1.0), (D,)),
                (batch.num_edges, D),
            )
        elif cfg.edge_encoder_kind == "linear":
            edge_attr = TorchDense(D, name="edge_encoder")(
                batch.edge_attr.astype(jnp.float32)
            )
        elif cfg.edge_encoder_kind == "ogb_bond":
            from escgnn_tpu.models.ogb_gnn import (
                BOND_FEATURE_DIMS,
                FeatureSumEncoder,
            )

            edge_attr = FeatureSumEncoder(
                BOND_FEATURE_DIMS, D, name="edge_encoder"
            )(batch.edge_attr)
        else:
            edge_attr = EmbedMM(
                cfg.edge_vocab, D, embedding_init=nn.initializers.normal(1.0),
                name="edge_encoder",
            )(
                batch.edge_attr.astype(jnp.int32).reshape(
                    batch.edge_attr.shape[0]
                )
            )

        for i in range(cfg.num_layers):
            h, edge_attr = GPSLayer(cfg, name=f"layer{i}")(
                h, edge_attr, batch,
                deterministic=deterministic,
                use_running_average=use_running_average,
            )

        if cfg.head == "inductive_edge":
            # dot-decoding link head: post-MP MLP keeps dim_h so node
            # embeddings can be dot-scored pairwise
            g = nn.relu(TorchDense(D, name="head1")(h))
            return TorchDense(D, name="head2")(g)
        if cfg.graph_pred:
            from escgnn_tpu.ops.segment import pool_nodes_to_graphs

            g = pool_nodes_to_graphs(
                h, batch, reduce="sum" if cfg.pool == "add" else "mean"
            )
        else:
            g = h
        g = nn.relu(TorchDense(D // 2, name="head1")(g))
        return TorchDense(cfg.out_dim, name="head2")(g)
