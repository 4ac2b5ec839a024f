#!/usr/bin/env python
"""Benchmarks: training-step throughput of the model zoo on one chip.

Prints one JSON line per benchmark; the FLAGSHIP line (ZINC
NestedGIN_eff — the reference's headline workload, `zinc_models.py:
504-611`) prints LAST:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

`vs_baseline` divides by THIS framework's prior-round measured value of
the same metric on the same chip (flagship: round 1, BASELINE.md
"Measured numbers"; secondary models: BENCH_r02.json), so the ratio
tracks regression/progress against a real measurement. (Earlier rounds
divided by a provisional unmeasured A100 PyG estimate; that invented
denominator is gone.)

Every line also carries:
  * `flops_per_step` — HLO-level FLOPs of the compiled train step
    (fwd + bwd + optimizer), from
    `jit(step).lower(...).compile().cost_analysis()`;
  * `mfu` — flops_per_step / measured step time / chip peak bf16
    FLOP/s (null when the chip's peak is unknown, e.g. CPU smoke);
  * `ms_per_step` (mean over scan windows), `ms_per_step_std`, and
    `windows` — ≥3 timed windows of the same on-device scan, so
    regressions are distinguishable from tunnel noise. `value` is
    derived from the MEAN window; `value_best` keeps the best-window
    number that earlier rounds reported.

Set BENCH_ONLY=flagship to skip the secondary models (each costs one
jit compile — 25-150 s over the remote-compile tunnel on first run).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# BENCH_SMOKE=1 shrinks graph counts and scan lengths so a CPU wiring
# check finishes in minutes; real measurements use the full sizes.
SMOKE = os.environ.get("BENCH_SMOKE") == "1"

# Round-1 measured flagship throughput on this chip (BASELINE.md) —
# kept as the `vs_r01` continuity field on the flagship line.
ROUND1_MEASURED_EDGES_PER_S = 8_950_718.0

# Round-4 measured throughputs on this chip — the `vs_baseline`
# denominators for EVERY line (results_archive/bench_r4b/, bench_r4c
# re-run 2026-08-21), so regressions on any metric are visible next
# round (VERDICT r04 weak #5: six of ten r04 lines had null
# vs_baseline because the denominators stopped at round 2).
ROUND4_MEASURED = {
    "counting_ppgn_eff_trainstep_edges_per_s_per_chip": 934_223.5,
    "zinc_gps_trainstep_edges_per_s_per_chip": 2_362_704.6,
    "molhiv_ogbgnn_trainstep_edges_per_s_per_chip": 1_861_909.8,
    "zinc_i2gnn_trainstep_copyedges_per_s_per_chip": 7_939_830.5,
    "zinc_ngnn_trainstep_copyedges_per_s_per_chip": 5_749_973.4,
    "zinc_nestedppgn_trainstep_copyedges_per_s_per_chip": 409_750.3,
    "molhiv_gineplus_trainstep_edges_per_s_per_chip": 2_064_734.8,
    "qm9_k123gnn_trainstep_copyedges_per_s_per_chip": 665_633.9,
    "pepstruct_gps_trainstep_edges_per_s_per_chip": 566_082.0,
    "zinc_nestedgin_eff_trainstep_edges_per_s_per_chip": 8_798_318.3,
}

# Peak dense bf16 FLOP/s per chip, by jax device_kind. v5e: 197 TFLOP/s
# (public spec). MFU is null on device kinds not listed here (CPU smoke).
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
}

# HBM bandwidth per chip (public spec: v5e 819 GB/s) — the denominator
# for the bandwidth side of `roofline_frac`.
PEAK_HBM_BYTES_PER_S = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
}


def device_peak_bw():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in PEAK_HBM_BYTES_PER_S.items():
        if k.lower() in kind.lower() or kind.lower() in k.lower():
            return v
    return None


def device_peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16_FLOPS.items():
        if k.lower() in kind.lower() or kind.lower() in k.lower():
            return v
    return None


def step_cost(step, state, batch, rng):
    """(flops, boundary_bytes, opcount_bytes) of the compiled single
    train step (fwd+bwd+optimizer).

    `boundary_bytes` (utils/hbm.py) charges operand/output bytes at the
    FUSION BOUNDARIES of the entry computation — real HBM traffic of the
    fused executable, the honest denominator for `roofline_frac`.
    `opcount_bytes` is XLA cost_analysis's per-op "bytes accessed" sum,
    which counts ops INSIDE fusions and overestimates traffic 2-3x on a
    fused TPU program (r04 lines showed analytic fracs of 1.2-2.6);
    kept for cross-round comparability as `bytes_per_step_opcount`."""
    from escgnn_tpu.utils.hbm import compiled_boundary_bytes

    try:
        compiled = step.lower(state, batch, rng).compile()
    except Exception:
        return None, None, None
    bb = compiled_boundary_bytes(compiled)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        b = float(ca.get("bytes accessed", 0.0))
        return (f if f > 0 else None), bb, (b if b > 0 else None)
    except Exception:
        return None, bb, None


def _raw_zinc_graphs(num, seed):
    """ZINC-subset-shaped synthetic molecules: ~23 heavy atoms, sparse
    bonds, 28 node types, 4 edge types (dataset stats of ZINC-12k)."""
    from escgnn_tpu.data.container import GraphData

    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(num):
        n = int(rng.integers(18, 30))
        a = np.arange(n - 1)
        extra = max(2, n // 6)
        c1 = rng.integers(0, n, extra)
        c2 = (c1 + rng.integers(2, 5, extra)) % n
        src = np.concatenate([a, c1])
        dst = np.concatenate([a + 1, c2])
        keep = src != dst
        src, dst = src[keep], dst[keep]
        ei = np.stack(
            [np.concatenate([src, dst]), np.concatenate([dst, src])]
        ).astype(np.int32)
        g = GraphData(
            num_nodes=n,
            edge_index=ei,
            x=rng.integers(0, 28, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        )
        graphs.append(g)
    return graphs


def make_zinc_like_graphs(num=128, seed=0, h=3):
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.transform import featurize_many

    cfg = EscConfig(h=h, use_rd=True, self_loop=True)
    return featurize_many(_raw_zinc_graphs(num, seed), cfg, num_workers=8)


def make_i2gnn_graphs(num=16, seed=0, h=2):
    """Pair-subgraph (I2GNN) copies of small molecule-shaped graphs: the
    copy-based baseline's own batch shape (reference utils_edge_I2.py
    create_subgraphs2 role) — its compute runs on the expanded copy
    union, so edges/s is reported on that supergraph."""
    from escgnn_tpu.featurize.pair_subgraphs import (
        PairSubgraphConfig,
        create_pair_subgraphs,
    )

    pcfg = PairSubgraphConfig(h=h, use_rd=True)
    return [create_pair_subgraphs(g, pcfg)
            for g in _raw_zinc_graphs(num, seed)]


def make_ngnn_graphs(num=16, seed=0, h=3, orig_adj=False):
    """Node-subgraph (NGNN) copies of ZINC-shaped graphs (reference
    utils.py create_subgraphs role). With `orig_adj`, also keeps the
    original adjacency for the NestedPPGN dense stack."""
    from escgnn_tpu.featurize.node_subgraphs import (
        NodeSubgraphConfig,
        create_node_subgraphs,
    )

    scfg = NodeSubgraphConfig(h=h, use_rd=True, keep_orig_adj=orig_adj)
    return [create_node_subgraphs(g, scfg)
            for g in _raw_zinc_graphs(num, seed)]


def make_ginep_graphs(num=32, seed=0, k=3):
    """Multihop-edge graphs for the GINE+ stack (reference
    gine_operations.py:335-362 runs on plain OGB molecules)."""
    from escgnn_tpu.data.molecules import synthetic_ogb_mol
    from escgnn_tpu.featurize.multihop import make_multihop_edges

    return [make_multihop_edges(g, k=k)
            for g in synthetic_ogb_mol(num_graphs=num, seed=seed,
                                       num_tasks=1)]


def make_kgnn_graphs(num=16, seed=0, h=3):
    """QM9-shaped graphs with distance edge attrs, node copies and 2-/3-
    set graphs for the k123 stack (reference run_qm9.py:165-207 role)."""
    from escgnn_tpu.data.qm9 import append_distance_edge_attr, synthetic_qm9
    from escgnn_tpu.featurize.kset import attach_kset_graphs
    from escgnn_tpu.featurize.node_subgraphs import (
        NodeSubgraphConfig,
        create_node_subgraphs,
    )

    scfg = NodeSubgraphConfig(h=h, use_rd=True)
    out = []
    for g in synthetic_qm9(num_graphs=num, seed=seed):
        g.y = np.asarray(g.y)[:1]
        g = append_distance_edge_attr(g)
        out.append(attach_kset_graphs(
            create_node_subgraphs(g, scfg), ks=(2, 3), malkin=True
        ))
    return out


def make_pep_graphs(num=16, seed=0):
    """Peptides-struct-shaped graphs (LRGB: ~150 nodes, chain-like
    backbone) with ESC features + all-pairs SPD attention bias — the
    compute-relevant GPS bench shape (dim_h >= 96, big M)."""
    from escgnn_tpu.data.container import GraphData
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.spd import attach_attn_bias
    from escgnn_tpu.featurize.transform import featurize_many

    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(num):
        n = int(rng.integers(120, 160))
        a = np.arange(n - 1)
        extra = n // 4
        c1 = rng.integers(0, n, extra)
        c2 = (c1 + rng.integers(2, 9, extra)) % n
        src = np.concatenate([a, c1])
        dst = np.concatenate([a + 1, c2])
        keep = src != dst
        src, dst = src[keep], dst[keep]
        ei = np.stack(
            [np.concatenate([src, dst]), np.concatenate([dst, src])]
        ).astype(np.int32)
        graphs.append(GraphData(
            num_nodes=n,
            edge_index=ei,
            x=rng.integers(0, 20, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(11,)).astype(np.float32),
        ))
    feats = featurize_many(
        graphs, EscConfig(h=2, use_rd=True, self_loop=True), num_workers=8
    )
    return [attach_attn_bias(g) for g in feats]


def make_counting_graphs(num=128, seed=0):
    from escgnn_tpu.data.counting import (
        CountingDatasetConfig,
        generate_counting_graphs,
    )
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.transform import featurize_many

    splits = generate_counting_graphs(
        CountingDatasetConfig(num_graphs=num, seed=seed)
    )
    graphs = [g for s in splits.values() for g in s][:num]
    for g in graphs:
        g.y = g.y[:, :1]
    return featurize_many(graphs, EscConfig(h=2, use_rd=True,
                                            self_loop=True), num_workers=8)


def make_molhiv_like_graphs(num=32, seed=0):
    from escgnn_tpu.data.molecules import synthetic_ogb_mol
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.transform import featurize_many

    graphs = synthetic_ogb_mol(num_graphs=num, seed=seed, num_tasks=1)
    return featurize_many(graphs, EscConfig(h=4, use_rd=True,
                                            self_loop=True), num_workers=8)


def scan_time(step, state, batch, rng, n_iter, windows=3):
    """Wall times of `windows` repeats of an n_iter on-device lax.scan of
    the train step (per-dispatch tunnel latency ~25 ms would otherwise
    dominate; the final float() forces a scalar transfer —
    block_until_ready does not reliably wait over the tunnel). Returns
    the list of window times so callers can report mean ± std."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    @partial(jax.jit, donate_argnums=(0,))
    def scan_steps(state, batch, rng):
        def body(s, i):
            return step.__wrapped__(s, batch, jax.random.fold_in(rng, i))

        return jax.lax.scan(body, state, jnp.arange(n_iter))

    # compile explicitly so the while-loop BODY's fusion-boundary bytes
    # can be read off the executable: XLA hoists batch-derived loop
    # invariants (one-hot operands, z-emb expansions) out of the body,
    # so the body bytes — not the single-step program's — are the
    # honest per-iteration HBM traffic of this timed loop
    from escgnn_tpu.utils.hbm import scan_body_bytes

    compiled = scan_steps.lower(state, batch, rng).compile()
    sb_bytes = scan_body_bytes(compiled)
    state, losses = compiled(state, batch, rng)
    float(losses[-1])  # warm
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        state, losses = compiled(state, batch, rng)
        float(losses[-1])
        times.append(time.perf_counter() - t0)
    return times, state, compiled, sb_bytes


def perf_fields(times, n_iter, real_edges, fps, peak, bps=None, bw=None,
                bps_opcount=None, bps_scanbody=None):
    """edges/s + step-time + MFU + roofline fields shared by every line.

    `roofline_frac` = achieved fraction of the BINDING chip resource:
    max(MFU, achieved-HBM-BW / peak BW); `binding_resource` names which
    side binds. Sparse message passing is HBM-bound, so its honest
    utilization number is the bandwidth side, not MFU.

    Three bytes estimates, most honest first:
    `bps_scanbody` — fusion-boundary bytes of the scan WHILE BODY, the
    true per-iteration traffic of the timed loop (XLA hoists
    batch-derived invariants out of the body); drives `hbm_bw_frac`.
    `bps` — boundary bytes of the single-step executable (includes the
    invariant setup; overstates steady state 2-4x on one-hot-heavy
    models). `bps_opcount` — XLA's per-op sum (counts inside fusions,
    2-3x above even that; kept for cross-round comparability)."""
    mean_t = float(np.mean(times))
    std_t = float(np.std(times))
    ms = mean_t / n_iter * 1e3
    step_s = mean_t / n_iter
    mfu = round(fps / step_s / peak, 4) if fps and peak else None
    bw_bytes = bps_scanbody if bps_scanbody else bps
    bw_frac = round(bw_bytes / step_s / bw, 4) if bw_bytes and bw else None
    # name the denominator explicitly: when scan_body_bytes fails
    # (e.g. a future XLA text-format change), the fallback single-step
    # entry bytes overstate steady state 2-4x on one-hot-heavy models —
    # cross-round tables must not mix the two sources unnoticed
    bw_frac_source = (
        "scanbody" if bps_scanbody else ("entry" if bps else None)
    )
    fields = {
        "value": round(real_edges * n_iter / mean_t, 1),
        "value_best": round(real_edges * n_iter / min(times), 1),
        "value_std": round(
            real_edges * n_iter / mean_t * (std_t / mean_t), 1
        ),
        "ms_per_step": round(ms, 4),
        "ms_per_step_std": round(std_t / n_iter * 1e3, 4),
        "windows": len(times),
        "flops_per_step": fps,
        "mfu": mfu,
        "bytes_per_step": bps,
        "bytes_per_step_opcount": bps_opcount,
        "bytes_per_step_scanbody": bps_scanbody,
        "hbm_bw_frac": bw_frac,
        "bw_frac_source": bw_frac_source,
    }
    if mfu is not None or bw_frac is not None:
        m, b = mfu or 0.0, bw_frac or 0.0
        fields["roofline_frac"] = max(m, b)
        fields["binding_resource"] = "flops" if m >= b else "hbm_bw"
    else:
        fields["roofline_frac"] = None
        fields["binding_resource"] = None
    return fields


def bench_model(name, graphs, spec, model, loss_fn, n_iter,
                node_level=False, real_edges=None, batch_transform=None):
    import jax
    import jax.numpy as jnp

    from escgnn_tpu.data.batching import pad_and_batch
    from escgnn_tpu.train.loop import (
        TrainState,
        adam_with_plateau,
        make_train_step,
    )

    host = pad_and_batch(graphs, spec)
    if batch_transform is not None:
        # e.g. the two-size bucketed copy re-layout
        # (data/uniform_copies.py bucketize_copy_batch)
        host = batch_transform(host)
    batch = jax.tree.map(jnp.asarray, host)
    if real_edges is None:
        real_edges = int(np.sum([g.num_edges for g in graphs]))
    variables = model.init(jax.random.key(0), batch)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(5e-4),
    )
    step = make_train_step(model, loss_fn)
    state, loss = step(state, batch, jax.random.key(1))
    float(loss)
    fps, bps, bps_op = step_cost(step, state, batch, jax.random.key(1))
    times, state, _, sb = scan_time(step, state, batch, jax.random.key(1),
                                    n_iter)
    return perf_fields(times, n_iter, real_edges, fps, device_peak_flops(),
                       bps, device_peak_bw(), bps_opcount=bps_op,
                       bps_scanbody=sb)


def flagship_spec(graphs, batch_size=None):
    """The flagship bench batch spec — shared with the A/B tools so
    their configs stay in parity with the bench (profile_step
    name-join requirement, BASELINE.md methodology)."""
    from escgnn_tpu.data.batching import BatchSpec

    return BatchSpec.uniform(
        graphs, batch_size or len(graphs), enc_layout="dedup"
    )


def flagship_model():
    """The flagship bench model config (see flagship_spec)."""
    from escgnn_tpu.models.nested_gin_eff import (
        NestedGINEff,
        NestedGINEffConfig,
    )

    return NestedGINEff(
        NestedGINEffConfig(
            hidden=256,
            num_layers=5,
            dropout=0.0,
            act="elu",
            graph_pred=True,
            pool="add",
            use_x_embedding_jk=False,
            head_order="dropout_act",
            node_embed_vocab=100,
            node_embed_dim=32,
            edge_embed_vocab=100,
            edge_embed_dim=32,
            # bf16 conv stacks (f32 master params + f32 loss/accumulation):
            # the TPU-idiomatic precision for training; the f32 backward of
            # the same step hits a ~20x slower XLA path (tools/ops_bench.py)
            compute_dtype="bfloat16",
        )
    )


def run_secondary(gsets):
    n_ppgn, n_other = (5, 10) if SMOKE else (50, 100)
    from escgnn_tpu.data.batching import BatchSpec
    from escgnn_tpu.data.uniform_copies import uniformize_dataset
    from escgnn_tpu.train.loop import (
        bce_graph_loss,
        l1_graph_loss,
        l1_node_loss,
    )

    counting_graphs = gsets["counting"]
    gps_graphs = gsets["gps"]
    ogb_graphs = gsets["ogb"]
    i2_graphs = gsets["i2"]

    lines = []

    # --- PPGN_eff on counting shapes (reference run_graphcount.py:207-308)
    graphs = counting_graphs
    spec = BatchSpec.from_graphs(graphs, batch_size=len(graphs))
    from escgnn_tpu.models.ppgn import PPGN, PPGNConfig

    # bf16 regular blocks: A/B'd 1.26x over f32 on this shape
    # (results_archive/gps_layout_ab, 2026-08-21)
    model = PPGN(PPGNConfig(
        emb_dim=128, num_rb_layers=3,
        max_nodes=spec.max_nodes_per_graph, node_level=True, use_esc=True,
        compute_dtype="bfloat16",
    ))
    f = bench_model("ppgn", graphs, spec, model, l1_node_loss, n_ppgn,
                    node_level=True)
    lines.append(dict(
        metric="counting_ppgn_eff_trainstep_edges_per_s_per_chip",
        unit="edges/s", **f,
    ))

    # --- GPS on ZINC shapes (zinc-GPS.yaml recipe)
    from escgnn_tpu.models.gps import GPSConfig, GPSModel

    graphs = gps_graphs
    # uniform per-graph blocks + dedup ESC rows: A/B'd 1.79x over the
    # flat layout on this shape (results_archive/gps_layout_ab,
    # 2026-08-21); numerically equal (tests/test_gps.py)
    spec = BatchSpec.uniform(graphs, batch_size=len(graphs),
                             enc_layout="dedup")
    model = GPSModel(GPSConfig(
        dim_h=64, num_layers=4, num_heads=4, use_esc=True,
        use_attn_bias=True, pool="add", out_dim=1,
    ))
    f = bench_model("gps", graphs, spec, model, l1_graph_loss, n_other)
    lines.append(dict(
        metric="zinc_gps_trainstep_edges_per_s_per_chip",
        unit="edges/s", **f,
    ))

    # --- OGB GNN on molhiv shapes (reference README molhiv config: h=4,
    # 6 layers, emb 300, virtual node)
    from escgnn_tpu.models.ogb_gnn import OgbGNN, OgbGNNConfig

    graphs = ogb_graphs
    # flagship playbook applied (round 3): uniform per-graph blocks
    # (einsum message passing), dedup ESC row layout (z MLP on unique
    # rows), bf16 conv stacks
    spec = BatchSpec.uniform(graphs, batch_size=len(graphs),
                             enc_layout="dedup")
    model = OgbGNN(OgbGNNConfig(
        num_tasks=1, num_layers=6, emb_dim=300, dropout=0.0,
        virtual_node=True, compute_dtype="bfloat16",
    ))
    f = bench_model("ogb", graphs, spec, model, bce_graph_loss, n_other)
    lines.append(dict(
        metric="molhiv_ogbgnn_trainstep_edges_per_s_per_chip",
        unit="edges/s", **f,
    ))

    # --- I2GNN on its pair-subgraph copies (reference zinc_models.py
    # I2GNN + utils_edge_I2.py transform; edges/s on the copy union).
    # Round 4: uniform per-copy blocks (data/uniform_copies.py) — the
    # per-layer aggregation runs as per-copy one-hot einsums on the MXU
    # and node->copy pooling as a masked reshape, replacing the global
    # XLA scatter-adds that profiled 15x off the HBM roofline
    # (results_archive/profile_i2gnn/). Numerically equal to the ragged
    # layout (tests/test_uniform_copies.py).
    # Round 5: two-size bucketed blocks (bucketize_copy_batch) — the
    # round-4-identified 1.76x block-padding residual; on these shapes
    # padded edge slots drop 2.09x -> ~1.4x of real edges. Numerically
    # equal (tests/test_bucketed_copies.py).
    from escgnn_tpu.data.uniform_copies import (
        bucketize_copy_batch,
        choose_bucket_sizes,
    )
    from escgnn_tpu.models.i2gnn import I2GNN, I2GNNConfig

    n_s, e_s = choose_bucket_sizes(i2_graphs)
    graphs = uniformize_dataset(i2_graphs)
    spec = BatchSpec.copy_uniform(graphs, batch_size=len(graphs),
                                  exact=True)
    model = I2GNN(I2GNNConfig(
        num_layers=3, hidden=64, use_rd=True,
        subgraph2_pooling="mean-center-side", gate=True, out_dim=1,
        compute_dtype="bfloat16",
    ))
    real_edges = int(np.sum([g.num_edges for g in i2_graphs]))
    f = bench_model(
        "i2gnn", graphs, spec, model, l1_graph_loss, n_ppgn,
        real_edges=real_edges,
        batch_transform=lambda b: bucketize_copy_batch(b, n_s, e_s),
    )
    lines.append(dict(
        metric="zinc_i2gnn_trainstep_copyedges_per_s_per_chip",
        unit="edges/s", **f,
    ))

    # --- NGNN on its node-subgraph copies (reference zinc_models.py:
    # 306-405 + utils.py create_subgraphs role), uniform per-copy blocks
    from escgnn_tpu.models.ngnn import NGNN, NGNNConfig

    ngnn_raw = gsets["ngnn"]
    n_s, e_s = choose_bucket_sizes(ngnn_raw)
    graphs = uniformize_dataset(ngnn_raw)
    spec = BatchSpec.copy_uniform(graphs, batch_size=len(graphs),
                                  exact=True)
    model = NGNN(NGNNConfig(num_layers=5, hidden=64, use_rd=True,
                            out_dim=1, compute_dtype="bfloat16"))
    real_edges = int(np.sum([g.num_edges for g in ngnn_raw]))
    f = bench_model(
        "ngnn", graphs, spec, model, l1_graph_loss, n_ppgn,
        real_edges=real_edges,
        batch_transform=lambda b: bucketize_copy_batch(b, n_s, e_s),
    )
    lines.append(dict(
        metric="zinc_ngnn_trainstep_copyedges_per_s_per_chip",
        unit="edges/s", **f,
    ))

    # --- NestedPPGN over node-copy subgraphs (reference kernel/ppgn.py
    # nested variant, run_ogb_mol.py --model NestedPPGN)
    from escgnn_tpu.models.nested_ppgn import NestedPPGN, NestedPPGNConfig

    graphs = gsets["nppgn"]
    spec = BatchSpec.from_graphs(graphs, batch_size=len(graphs))
    max_sub = 1
    for g in graphs:
        seg = np.asarray(g.extras["node_to_subgraph"])
        max_sub = max(max_sub, int(np.bincount(seg).max()))
    # round 5: bf16 RegularBlock stacks (flagship playbook; the flat
    # PPGN's bf16 A/B gave 1.28x at equal shapes)
    model = NestedPPGN(NestedPPGNConfig(
        emb_dim=64, num_rb_layers=2, num_tasks=1, use_rd=True,
        max_nodes_per_subgraph=max_sub, classify=False,
        compute_dtype="bfloat16",
    ))
    f = bench_model("nppgn", graphs, spec, model, l1_graph_loss, n_ppgn)
    lines.append(dict(
        metric="zinc_nestedppgn_trainstep_copyedges_per_s_per_chip",
        unit="edges/s", **f,
    ))

    # --- GINE+ multihop stack (reference gine_operations.py:335-362)
    from escgnn_tpu.models.gine_plus import GINEPlusConfig, GINEPlusNetwork

    graphs = gsets["ginep"]
    # round 5: uniform per-graph blocks (scatter -> one-hot einsum on
    # the MXU) + bf16 messages — the flagship playbook (VERDICT r04 #6)
    spec = BatchSpec.uniform(graphs, batch_size=len(graphs))
    model = GINEPlusNetwork(GINEPlusConfig(
        hidden=100, out_dim=1, num_layers=6, dropout=0.0, k=3,
        virtual_node=True, compute_dtype="bfloat16",
    ))
    f = bench_model("ginep", graphs, spec, model, bce_graph_loss, n_other)
    lines.append(dict(
        metric="molhiv_gineplus_trainstep_edges_per_s_per_chip",
        unit="edges/s", **f,
    ))

    # --- k123 k-GNN (reference run_qm9.py:165-207 + k-gnn graph_cpu)
    from escgnn_tpu.models.kgnn_models import KGNN, KGNNConfig

    graphs = gsets["kgnn"]
    spec = BatchSpec.from_graphs(graphs, batch_size=len(graphs))
    model = KGNN(KGNNConfig(
        levels=(2, 3), use_rd=True, use_pos=True, nested=True, out_dim=1,
    ))
    f = bench_model("kgnn", graphs, spec, model, l1_graph_loss, n_ppgn)
    lines.append(dict(
        metric="qm9_k123gnn_trainstep_copyedges_per_s_per_chip",
        unit="edges/s", **f,
    ))

    # --- GPS at compute-relevant scale (peptides-struct shape: dim_h 96,
    # 10 layers, M ~160 — the attention stack above the tiny-shape noise
    # floor; VERDICT r03 weak #3)
    graphs = gsets["pep"]
    spec = BatchSpec.uniform(graphs, batch_size=len(graphs),
                             enc_layout="dedup")
    model = GPSModel(GPSConfig(
        dim_h=96, num_layers=10, num_heads=4, use_esc=True,
        use_attn_bias=True, pool="mean", out_dim=11,
    ))
    f = bench_model("gps_pep", graphs, spec, model, l1_graph_loss, n_ppgn)
    lines.append(dict(
        metric="pepstruct_gps_trainstep_edges_per_s_per_chip",
        unit="edges/s", **f,
    ))

    for line in lines:
        base = ROUND4_MEASURED.get(line["metric"])
        line["vs_baseline"] = (
            round(line["value"] / base, 3) if base else None
        )
    return lines


def main():
    # featurize (fork pool) BEFORE importing jax: forking a process that
    # already initialized XLA's thread pools can deadlock
    batch_size = 16 if SMOKE else 128
    graphs = make_zinc_like_graphs(num=batch_size)
    only_flagship = os.environ.get("BENCH_ONLY") == "flagship"
    if not only_flagship:
        # ALL featurization (fork pools) must happen before jax init
        from escgnn_tpu.featurize.spd import attach_attn_bias

        gsets = dict(
            counting=make_counting_graphs(num=16 if SMOKE else 128),
            gps=[
                attach_attn_bias(g)
                for g in make_zinc_like_graphs(num=8 if SMOKE else 32, h=3)
            ],
            ogb=make_molhiv_like_graphs(num=8 if SMOKE else 32),
            i2=make_i2gnn_graphs(num=4 if SMOKE else 16),
            ngnn=make_ngnn_graphs(num=4 if SMOKE else 16),
            nppgn=make_ngnn_graphs(num=4 if SMOKE else 16, h=2,
                                   orig_adj=True),
            ginep=make_ginep_graphs(num=8 if SMOKE else 32),
            kgnn=make_kgnn_graphs(num=4 if SMOKE else 16),
            pep=make_pep_graphs(num=2 if SMOKE else 16),
        )

    import jax
    from escgnn_tpu.utils import setup_jax
    setup_jax()  # persistent XLA compile cache
    import jax.numpy as jnp

    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
    from escgnn_tpu.train.loop import (
        TrainState,
        adam_with_plateau,
        l1_graph_loss,
        make_train_step,
    )

    if not only_flagship:
        for line in run_secondary(gsets):
            print(json.dumps(line))

    # uniform per-graph blocks: every graph padded to the same
    # (nodes, edges) block so GINE gather/scatter run as per-graph
    # one-hot einsums on the MXU instead of global XLA gather/scatter.
    # Dedup encoding layout: molecular graphs repeat ESC histograms
    # heavily (~3.4x here), so the z-emb reduce runs on unique rows only.
    spec = flagship_spec(graphs, batch_size)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    real_edges = int(np.sum([g.num_edges for g in graphs]))

    model = flagship_model()
    rng = jax.random.key(0)
    variables = model.init(rng, batch)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(5e-4),
    )
    step = make_train_step(model, l1_graph_loss)
    state, loss = step(state, batch, rng)
    float(loss)
    fps, bps, bps_op = step_cost(step, state, batch, rng)

    n_iter = 20 if SMOKE else 400
    times, state, scan_steps, sb = scan_time(step, state, batch, rng,
                                             n_iter, windows=5)

    # optional post-timing jax.profiler trace (tools/profile_step.py)
    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            state, losses = scan_steps(state, batch, rng)
            float(losses[-1])

    fields = perf_fields(times, n_iter, real_edges, fps,
                         device_peak_flops(), bps, device_peak_bw(),
                         bps_opcount=bps_op, bps_scanbody=sb)
    print(
        json.dumps(
            dict(
                metric="zinc_nestedgin_eff_trainstep_edges_per_s_per_chip",
                unit="edges/s",
                **fields,
                vs_baseline=round(
                    fields["value"] / ROUND4_MEASURED[
                        "zinc_nestedgin_eff_trainstep_edges_per_s_per_chip"
                    ], 3
                ),
                vs_r01=round(
                    fields["value"] / ROUND1_MEASURED_EDGES_PER_S, 3
                ),
            )
        )
    )


if __name__ == "__main__":
    main()
