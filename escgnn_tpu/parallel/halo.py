"""Node+edge-partitioned message passing with explicit halo exchange.

The scaling axis the reference lacks entirely (its distribution story is
one DistributedSampler, reference `kernel/train_eval.py:44-52`), designed
for the case data parallelism cannot cover: a batched supergraph (or one
giant graph) too large for a single chip's HBM.

Partition (host-side `plan_halo_sharding`, consuming the batcher's
receiver-sorted edge layout):

  * nodes: contiguous ranges of `num_nodes / D` per device — node state,
    masks and node payloads are simply range-sharded;
  * edges: because `pad_and_batch` sorts edges by receiver, the edges
    whose RECEIVER a device owns form one contiguous slice; each slice is
    padded to the common `E_shard` budget. Every edge's output is then
    local — the per-node aggregation is a plain sorted segment-sum with
    NO psum (contrast `parallel/edge_partition.py`, which replicates node
    state and pays a psum per layer);
  * only SENDERS can be remote. Each device publishes the rows other
    devices reference ("boundary set" `B_d`), one `all_gather` over ICI
    ships the (D, B_max, F) boundary block, and each device gathers its
    halo rows from it. Communication per layer is O(D * B_max * F) — the
    cut size of the partition — instead of O(N * F) for a full
    all-gather. The boundary gather, the all_gather, and the local-edge
    message compute are independent until the halo concat, so XLA's
    scheduler overlaps the collective with local work.

Gradients need no hand-written collectives: shard_map transposes the
all_gather into a reduce-scatter automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from escgnn_tpu.data.container import GraphBatch


@dataclasses.dataclass
class HaloPlan:
    """Host-built sharding plan. Arrays carry a leading device axis D and
    are placed with `shard_plan` (leading axis over the mesh)."""

    num_devices: int
    nodes_per_shard: int  # N / D
    # (D, E_shard) local edge arrays: receivers in [0, nodes_per_shard),
    # senders in [0, nodes_per_shard + halo_max) — ids >= nodes_per_shard
    # index the halo block
    senders: np.ndarray
    receivers: np.ndarray
    edge_mask: np.ndarray
    edge_perm: np.ndarray  # (D, E_shard) global edge id feeding each slot
    # (D, B_max) local ids of owned rows other devices reference
    boundary_send: np.ndarray
    # (D, H_max) positions into the flattened (D * B_max) boundary block
    halo_src: np.ndarray

    @property
    def edge_shard(self) -> int:
        return self.senders.shape[1]


def plan_halo_sharding(
    batch: GraphBatch,
    num_devices: int,
    edge_budget: int = 0,
    boundary_budget: int = 0,
    halo_budget: int = 0,
) -> HaloPlan:
    """Partition a padded batch's edges by receiver range (host side).

    The optional budgets override the computed E_shard / B_max / H_max
    (each is raised to at least the computed value): planning a POOL of
    batches with shared budgets gives every halo batch identical shapes,
    so one compiled train step serves the whole epoch."""
    N = batch.num_nodes
    D = num_devices
    assert N % D == 0, (N, D)
    nps = N // D
    senders = np.asarray(batch.senders)
    receivers = np.asarray(batch.receivers)
    emask = np.asarray(batch.edge_mask)
    E = senders.shape[0]

    owner_e = receivers // nps  # receivers sorted => shards are contiguous
    counts = np.bincount(owner_e, minlength=D)
    E_shard = int(-(-int(counts.max()) // 8) * 8)
    E_shard = max(E_shard, int(edge_budget))

    s_l = np.zeros((D, E_shard), np.int32)
    r_l = np.zeros((D, E_shard), np.int32)
    m_l = np.zeros((D, E_shard), bool)
    perm = np.zeros((D, E_shard), np.int32)
    halo_global: list[np.ndarray] = []
    starts = np.searchsorted(owner_e, np.arange(D))
    ends = np.searchsorted(owner_e, np.arange(D) + 1)
    for d in range(D):
        sl = slice(int(starts[d]), int(ends[d]))
        k = ends[d] - starts[d]
        sd, rd, md = senders[sl], receivers[sl], emask[sl]
        lo = d * nps
        remote = (sd < lo) | (sd >= lo + nps)
        halo_ids = np.unique(sd[remote & md])
        local_of = {int(g): nps + i for i, g in enumerate(halo_ids)}
        s_loc = np.where(remote, 0, sd - lo)
        for i in np.flatnonzero(remote):
            s_loc[i] = local_of.get(int(sd[i]), nps)  # masked edges -> 0th halo
        s_l[d, :k] = s_loc
        r_l[d, :k] = rd - lo
        m_l[d, :k] = md
        perm[d, :k] = np.arange(starts[d], ends[d])
        # padding edge slots: receiver 0 with mask False (sorted not
        # required per-shard? it is: padded tail receives nps - 1)
        r_l[d, k:] = nps - 1
        halo_global.append(halo_ids)

    H_max = max((len(h) for h in halo_global), default=0)
    H_max = max(int(-(-H_max // 8) * 8), 8, int(halo_budget))
    # boundary sets: rows owned by d that other devices request
    boundary: list[np.ndarray] = []
    for d in range(D):
        req = np.unique(
            np.concatenate(
                [h[(h >= d * nps) & (h < (d + 1) * nps)]
                 for h in halo_global] or [np.zeros(0, np.int64)]
            )
        )
        boundary.append(req)
    B_max = max((len(b) for b in boundary), default=0)
    B_max = max(int(-(-B_max // 8) * 8), 8, int(boundary_budget))
    b_send = np.zeros((D, B_max), np.int32)
    pos_of: dict[int, int] = {}
    for d in range(D):
        b_send[d, : len(boundary[d])] = boundary[d] - d * nps
        for i, g in enumerate(boundary[d]):
            pos_of[int(g)] = d * B_max + i
    halo_src = np.zeros((D, H_max), np.int32)
    for d in range(D):
        for i, g in enumerate(halo_global[d]):
            halo_src[d, i] = pos_of[int(g)]

    return HaloPlan(
        num_devices=D,
        nodes_per_shard=nps,
        senders=s_l,
        receivers=r_l,
        edge_mask=m_l,
        edge_perm=perm,
        boundary_send=b_send,
        halo_src=halo_src,
    )


def shard_plan(plan: HaloPlan, mesh: Mesh, axis: str = "model"):
    """Device-put the plan's arrays with the leading axis over the mesh.
    Returns a dict of jax arrays (the plan itself stays host-side)."""
    sh = NamedSharding(mesh, P(axis))
    return {
        k: jax.device_put(jnp.asarray(getattr(plan, k)), sh)
        for k in (
            "senders", "receivers", "edge_mask", "edge_perm",
            "boundary_send", "halo_src",
        )
    }


def halo_exchange(x_local, boundary_send, halo_src, axis: str):
    """Fetch remote sender rows: publish owned boundary rows, all_gather
    the (D, B_max, F) block over ICI, gather this shard's halo rows.

    `x_local` (N_local, F) is this device's node-state shard (inside
    shard_map). Returns (H_max, F) halo rows."""
    boundary = jnp.take(x_local, boundary_send, axis=0)  # (B_max, F)
    block = jax.lax.all_gather(boundary, axis)  # (D, B_max, F)
    flat = block.reshape(-1, x_local.shape[-1])
    return jnp.take(flat, halo_src, axis=0)


def halo_gine_aggregate(
    x_local, edge_emb_local, plan_dev, axis: str,
    edge_mask_local: Optional[jax.Array] = None,
):
    """One GINE message aggregation under the halo plan (inside
    shard_map): out[v] = sum_{(u -> v) local} relu(x_ext[u] + e_uv).
    Purely local segment-sum — the only collective is the halo
    all_gather."""
    halo = halo_exchange(
        x_local, plan_dev["boundary_send"], plan_dev["halo_src"], axis
    )
    x_ext = jnp.concatenate([x_local, halo], axis=0)
    msg = jax.nn.relu(
        jnp.take(x_ext, plan_dev["senders"], axis=0) + edge_emb_local
    )
    mask = plan_dev["edge_mask"]
    if edge_mask_local is not None:
        mask = mask & edge_mask_local
    msg = jnp.where(mask[:, None], msg, 0.0)
    return jax.ops.segment_sum(
        msg, plan_dev["receivers"],
        num_segments=x_local.shape[0], indices_are_sorted=True,
    )


def make_halo_gine_forward(mesh: Mesh, axis: str = "model"):
    """shard_map'd aggregation: (x (N, F) sharded by rows, edge_emb
    (D, E_shard, F) sharded, plan arrays sharded) -> (N, F) sharded."""

    def local_fn(x_sh, edge_emb_sh, plan_sh):
        plan_dev = {k: v[0] for k, v in plan_sh.items()}
        out = halo_gine_aggregate(x_sh, edge_emb_sh[0], plan_dev, axis)
        return out

    plan_specs = {
        k: P(axis) for k in (
            "senders", "receivers", "edge_mask", "edge_perm",
            "boundary_send", "halo_src",
        )
    }
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), plan_specs),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def make_halo_train_step(mesh: Mesh, num_layers: int, lr: float = 1e-2,
                         axis: str = "model"):
    """Full node+edge-partitioned training step for a GINE stack (proof
    of the halo execution end to end: forward, backward through the
    all_gather (auto-transposed to reduce-scatter), masked-global loss
    via psum, replicated SGD update).

    params: {'w_i': (F, F), 'b_i': (F,)} per layer, replicated.
    Inputs: x/y/node_mask row-sharded, edge_emb + plan arrays sharded.
    Loss: masked L2 to y — psum'd so every replica steps identically.
    """

    def local_step(params, x_sh, edge_emb_sh, y_sh, node_mask_sh, plan_sh):
        plan_dev = {k: v[0] for k, v in plan_sh.items()}

        def forward(params):
            h = x_sh
            for i in range(num_layers):
                agg = halo_gine_aggregate(
                    h, edge_emb_sh[0], plan_dev, axis
                )
                h = jax.nn.relu(
                    (h + agg) @ params[f"w_{i}"] + params[f"b_{i}"]
                )
            return h

        # global masked count (no params involved -> no AD through it)
        cnt = jax.lax.psum(jnp.sum(node_mask_sh), axis)

        def loss_fn(params):
            out = forward(params)
            err = jnp.where(
                node_mask_sh[:, None], out - y_sh, 0.0
            )
            # LOCAL contribution to the global mean; differentiating the
            # psum'd total instead would scale cotangents by D (psum's
            # transpose psums the replicated cotangent)
            return jnp.sum(err * err) / jnp.maximum(cnt, 1.0)

        loss_local, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, axis)  # exact global gradient
        loss = jax.lax.psum(loss_local, axis)  # exact global loss
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    plan_specs = {
        k: P(axis) for k in (
            "senders", "receivers", "edge_mask", "edge_perm",
            "boundary_send", "halo_src",
        )
    }
    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), plan_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def build_halo_batch(batch: GraphBatch, plan: HaloPlan) -> GraphBatch:
    """Re-layout a padded WIDTH-layout batch into per-device halo shards
    (host side). Every array gains a leading device axis D:

      * node-aligned arrays (x/y/pos/node_mask) -> (D, N/D, ...) range
        shards;
      * edge-aligned arrays (senders/receivers/edge_mask from the plan;
        edge_attr + the per-edge enc_idx/enc_cnt re-laid via
        `scatter_edge_payload`) -> (D, E_shard, ...);
      * the plan's boundary_send/halo_src ride in `extras` for the
        model's per-conv halo exchange (models/layers.py GINEConv
        halo_axis path).

    Feed the result to `make_halo_nested_train_step` with in_spec
    P(axis) — inside shard_map each device strips its leading axis and
    sees a normal local GraphBatch.
    """
    assert batch.enc_idx is not None and batch.enc_edge_row is None, (
        "halo sharding requires the width enc layout "
        "(BatchSpec(..., enc_layout='width')): per-edge rows shard exactly"
    )
    D, nps = plan.num_devices, plan.nodes_per_shard
    N = batch.node_mask.shape[0]

    def node_shard(a):
        return None if a is None else np.asarray(a).reshape(
            (D, nps) + np.asarray(a).shape[1:]
        )

    def edge_shard(a):
        return None if a is None else scatter_edge_payload(
            plan, np.asarray(a)
        )

    def graph_rep(a):
        return None if a is None else np.broadcast_to(
            np.asarray(a), (D,) + np.asarray(a).shape
        )

    # y may be node-aligned (node-level heads) or graph-aligned
    # (graph-level heads: replicated targets, local pool psum'd globally
    # inside the model — see NestedGINEff halo_axis + graph_pred)
    y = None
    if batch.y is not None:
        y = (
            node_shard(batch.y)
            if np.asarray(batch.y).shape[0] == N
            else graph_rep(batch.y)
        )

    return GraphBatch(
        x=node_shard(batch.x),
        y=y,
        pos=node_shard(batch.pos),
        node_mask=node_shard(batch.node_mask),
        # node_graph carries GLOBAL graph ids per local node row — the
        # graph-level pool segments into the replicated (G,) slots
        node_graph=node_shard(batch.node_graph),
        senders=plan.senders,
        receivers=plan.receivers,
        edge_mask=plan.edge_mask,
        edge_attr=edge_shard(batch.edge_attr),
        enc_idx=edge_shard(batch.enc_idx),
        enc_cnt=edge_shard(batch.enc_cnt),
        graph_mask=graph_rep(batch.graph_mask),
        extras={
            "halo_boundary_send": plan.boundary_send,
            "halo_src": plan.halo_src,
        },
    )


def make_halo_nested_train_step(
    model, mesh: Mesh, axis: str = "model", graph_loss_fn=None
):
    """Train the REAL flagship model (NestedGINEff with
    `cfg.halo_axis=axis`) under receiver-range node+edge sharding:
    z-emb width path on local edge shards, every MaskedBatchNorm
    psum-reducing masked statistics to the global moments, per-conv
    boundary all_gather, JK + head.

    Loss, node-level heads (graph_loss_fn=None): masked L1 over nodes,
    exact global (local contribution divided by the psum'd count, then
    psum'd — same value as `train.loop.l1_node_loss` on the unsharded
    batch). Graph-level heads (graph_loss_fn given, model built with
    `graph_pred=True`): the model's pool psums local per-graph partial
    sums so `out` is replicated; the local loss is the FULL
    graph_loss_fn(out, batch) divided by D — psum'd back to the exact
    global loss, and (because psum's transpose psums the replicated
    cotangent, restoring the 1/D) the psum'd gradients are exact for
    both head and body parameters. Gradients psum to the exact global
    gradient; the replicated optimizer update runs identically on every
    shard, so the step is numerically equivalent to the single-device
    step (tests/test_halo.py asserts allclose).

    Returns step(state, halo_batch, rng) -> (state, loss) where
    `halo_batch` comes from `build_halo_batch` (leading device axis,
    placed with in_spec P(axis)).
    """
    import optax

    from escgnn_tpu.train.loop import TrainState

    def local_step(state: TrainState, batch_sh: GraphBatch, rng):
        batch = jax.tree.map(lambda a: a[0], batch_sh)
        cnt = jax.lax.psum(
            jnp.sum(batch.node_mask.astype(jnp.float32)), axis
        )
        D = jax.lax.psum(1.0, axis)

        def compute(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                deterministic=False,
                use_running_average=False,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            if graph_loss_fn is not None:
                # replicated graph-level output: full loss / D (see doc)
                return graph_loss_fn(out, batch) / D, mut["batch_stats"]
            err = jnp.abs(out - batch.y)
            err = err * batch.node_mask.astype(err.dtype)[:, None]
            # LOCAL contribution to the global masked mean (psum'd below;
            # differentiating a psum'd total would scale cotangents by D)
            loss_local = jnp.sum(err) / jnp.maximum(
                cnt * err.shape[-1], 1.0
            )
            return loss_local, mut["batch_stats"]

        (loss_local, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        grads = jax.lax.psum(grads, axis)
        loss = jax.lax.psum(loss_local, axis)
        # BN stats are already global: every MaskedBatchNorm psums its
        # moments internally, so new_stats is identical on all shards
        updates, new_opt = state.tx.update(
            grads, state.opt_state, state.params
        )
        return (
            state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    # every array in the halo batch carries the leading device axis, so a
    # single P(axis) prefix-spec shards the whole pytree
    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def scatter_edge_payload(plan: HaloPlan, payload: np.ndarray) -> np.ndarray:
    """Re-layout a global (E, ...) edge payload into the plan's
    (D, E_shard, ...) shards (host side; padding slots get zeros)."""
    out = np.zeros(
        (plan.num_devices, plan.edge_shard) + payload.shape[1:],
        payload.dtype,
    )
    valid = plan.edge_mask
    out[valid] = payload[plan.edge_perm[valid]]
    return out
