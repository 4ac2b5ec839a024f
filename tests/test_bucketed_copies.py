"""Two-size bucketed copy-block layout (VERDICT r04 #3): the bucketed
re-layout must be numerically EQUAL to the single-size uniform layout —
same losses, same gradients — for both I2GNN (pair copies) and NGNN
(node copies), while strictly shrinking padded edge slots."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.data.uniform_copies import (
    bucketize_copy_batch,
    choose_bucket_sizes,
    uniformize_dataset,
)


def _mol_graphs(num=6, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        n = int(rng.integers(8, 16))
        src = list(range(n - 1)) + list(range(1, n))
        dst = list(range(1, n)) + list(range(n - 1))
        for _ in range(2):
            a, b = rng.integers(0, n, 2)
            if a != b:
                src += [int(a), int(b)]
                dst += [int(b), int(a)]
        ei = np.stack([src, dst]).astype(np.int64)
        key = ei[0] * n + ei[1]
        _, keep = np.unique(key, return_index=True)
        ei = ei[:, np.sort(keep)]
        out.append(GraphData(
            num_nodes=n, edge_index=ei.astype(np.int32),
            x=rng.integers(0, 20, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        ))
    return out


def _featurize(kind):
    gs = _mol_graphs()
    if kind == "i2":
        from escgnn_tpu.featurize.pair_subgraphs import (
            PairSubgraphConfig,
            create_pair_subgraphs,
        )

        return [create_pair_subgraphs(g, PairSubgraphConfig(h=2, use_rd=True))
                for g in gs]
    from escgnn_tpu.featurize.node_subgraphs import (
        NodeSubgraphConfig,
        create_node_subgraphs,
    )

    return [create_node_subgraphs(g, NodeSubgraphConfig(h=2, use_rd=True))
            for g in gs]


def _loss_and_grads(model, batch, loss_fn):
    b = jax.tree.map(jnp.asarray, batch)
    var = model.init(jax.random.key(0), b)

    @jax.jit
    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": var.get("batch_stats", {})},
            b, deterministic=True, use_running_average=False,
            mutable=["batch_stats"],
        )
        return loss_fn(out, b)

    return jax.value_and_grad(loss)(var["params"])


def _bucketize(batch):
    n_c, e_c = batch.nodes_per_seg, batch.edges_per_seg
    nm = np.asarray(batch.node_mask)
    em = np.asarray(batch.edge_mask)
    S = nm.shape[0] // n_c
    rn = nm.reshape(S, n_c).sum(1)
    re_ = em.reshape(S, e_c).sum(1)
    seg_mask = np.asarray(
        batch.segment2_mask if batch.segment2_mask is not None
        else batch.segment_mask
    )
    real = np.flatnonzero(seg_mask)
    # median split
    e_s = int(np.median(re_[real]))
    n_s = int(rn[real][re_[real] <= e_s].max())
    return bucketize_copy_batch(batch, n_s, e_s)


@pytest.mark.parametrize("kind", ["i2", "ngnn"])
def test_bucketed_equals_uniform(kind):
    feats = uniformize_dataset(_featurize(kind))
    spec = BatchSpec.copy_uniform(feats, batch_size=len(feats), exact=True)
    base = pad_and_batch(feats, spec)
    buck = _bucketize(base)

    (cs, n_s, e_s), (cl, n_l, e_l) = buck.seg_regions
    assert cs > 0 and cl > 0
    # strictly fewer edge slots than the single-size layout
    assert cs * e_s + cl * e_l < base.edge_mask.shape[0]
    assert buck.node_mask.sum() == base.node_mask.sum()
    assert buck.edge_mask.sum() == base.edge_mask.sum()

    if kind == "i2":
        from escgnn_tpu.models.i2gnn import I2GNN, I2GNNConfig
        from escgnn_tpu.train.loop import l1_graph_loss

        model = I2GNN(I2GNNConfig(
            num_layers=2, hidden=16, use_rd=True,
            subgraph2_pooling="mean-center-side", gate=True,
            double_pooling=True, subgraph_pooling="mean-context",
        ))
        loss_fn = l1_graph_loss
    else:
        from escgnn_tpu.models.ngnn import NGNN, NGNNConfig
        from escgnn_tpu.train.loop import l1_graph_loss

        model = NGNN(NGNNConfig(num_layers=2, hidden=16, use_rd=True))
        loss_fn = l1_graph_loss

    l0, g0 = _loss_and_grads(model, base, loss_fn)
    l1, g1 = _loss_and_grads(model, buck, loss_fn)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_choose_bucket_sizes_reduces_padding():
    feats = _featurize("i2")
    n_s, e_s = choose_bucket_sizes(feats)
    from escgnn_tpu.data.uniform_copies import copy_block_sizes

    n_c, e_c = copy_block_sizes(feats)
    assert n_s <= n_c and e_s < e_c


def test_bucketize_with_region_padding():
    feats = uniformize_dataset(_featurize("ngnn"))
    spec = BatchSpec.copy_uniform(feats, batch_size=len(feats), exact=True)
    base = pad_and_batch(feats, spec)
    n_c, e_c = base.nodes_per_seg, base.edges_per_seg
    nm = np.asarray(base.node_mask)
    em = np.asarray(base.edge_mask)
    S = nm.shape[0] // n_c
    re_ = em.reshape(S, e_c).sum(1)
    seg_mask = np.asarray(base.segment_mask)
    real = np.flatnonzero(seg_mask)
    e_s = int(np.median(re_[real]))
    n_s = int(nm.reshape(S, n_c).sum(1)[real][re_[real] <= e_s].max())
    a = bucketize_copy_batch(base, n_s, e_s)
    b = bucketize_copy_batch(base, n_s, e_s, pad_small=3, pad_large=2)
    assert b.seg_regions[0][0] == a.seg_regions[0][0] + 3
    assert b.seg_regions[1][0] == a.seg_regions[1][0] + 2
    assert b.node_mask.sum() == a.node_mask.sum()
    assert b.edge_mask.sum() == a.edge_mask.sum()


def test_bucketize_budget_demotion():
    feats = uniformize_dataset(_featurize("i2"))
    spec = BatchSpec.copy_uniform(feats, batch_size=len(feats), exact=True)
    base = pad_and_batch(feats, spec)
    n_c, e_c = base.nodes_per_seg, base.edges_per_seg
    nm = np.asarray(base.node_mask)
    em = np.asarray(base.edge_mask)
    S = nm.shape[0] // n_c
    re_ = em.reshape(S, e_c).sum(1)
    seg_mask = np.asarray(base.segment2_mask)
    real = np.flatnonzero(seg_mask)
    e_s = int(np.median(re_[real]))
    n_s = int(nm.reshape(S, n_c).sum(1)[real][re_[real] <= e_s].max())
    free = bucketize_copy_batch(base, n_s, e_s)
    cs0 = free.seg_regions[0][0]
    cl0 = free.seg_regions[1][0]
    # pin a tight small budget: overflow smalls demote to large slots
    buck = bucketize_copy_batch(
        base, n_s, e_s, cs_budget=cs0 - 5, cl_budget=cl0 + 10
    )
    assert buck.seg_regions[0][0] == cs0 - 5
    assert buck.node_mask.sum() == base.node_mask.sum()
    assert buck.edge_mask.sum() == base.edge_mask.sum()
    # numerics survive demotion
    import jax

    from escgnn_tpu.models.i2gnn import I2GNN, I2GNNConfig
    from escgnn_tpu.train.loop import l1_graph_loss

    model = I2GNN(I2GNNConfig(num_layers=2, hidden=16, use_rd=True))
    l0, _ = _loss_and_grads(model, base, l1_graph_loss)
    l1, _ = _loss_and_grads(model, buck, l1_graph_loss)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    # too-small large budget raises
    with pytest.raises(ValueError):
        bucketize_copy_batch(base, n_s, e_s, cs_budget=0, cl_budget=1)
