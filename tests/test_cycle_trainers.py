"""Cycle-prediction trainers (reference kernel/train_eval.py:333-691):
node-split BCE / MSE trainers, graph-split GC trainer, and the
BaselineGNN node_level / multi_layer heads they drive."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.data.counting import count_cycles_per_node
from escgnn_tpu.featurize.node_subgraphs import (
    NodeSubgraphConfig,
    create_node_subgraphs,
)
from escgnn_tpu.models.baselines import BaselineGNN, BaselineGNNConfig
from escgnn_tpu.train.cycles import (
    node_split,
    train_val_cycles,
    train_val_cycles_regression,
    train_val_cycles_regression_GC,
)
from tests.conftest import random_graph


def cycle_graph(rng, min_n=8, max_n=14):
    n, ei = random_graph(rng, min_n=min_n, max_n=max_n, p=0.4)
    g = GraphData(
        num_nodes=n, edge_index=ei,
        x=np.ones((n, 4), np.float32),
    )
    cyc = count_cycles_per_node(n, ei).astype(np.float32)
    return g, cyc


def model_cfg(**kw):
    base = dict(
        conv="gcn", hidden=16, num_layers=3, out_dim=4, dropout=0.0,
        classify=False, node_level=True, jk=True,
    )
    base.update(kw)
    return BaselineGNN(BaselineGNNConfig(**base))


def test_node_split_partition():
    tr, va, te = node_split(20, 0.3, seed=7)
    allidx = np.sort(np.concatenate([tr, va, te]))
    assert (allidx == np.arange(20)).all()
    assert len(tr) == 6 and len(va) == 7 and len(te) == 7


def test_multi_layer_head_shapes(rng):
    g, cyc = cycle_graph(rng)
    model = model_cfg(multi_layer=True)
    spec = BatchSpec.from_graphs([g], batch_size=1)
    batch = jax.tree.map(jnp.asarray, pad_and_batch([g], spec))
    variables = model.init(jax.random.key(0), batch)
    out, ys = model.apply(variables, batch)
    assert out.shape[-1] == 4
    # aux head i predicts min(2i-1, out_dim) columns
    # (reference kernel/gcn.py:51)
    assert [a.shape[-1] for a in ys] == [1, 3]
    assert all(a.shape[0] == out.shape[0] for a in ys)


def test_train_val_cycles_bce(rng):
    g, cyc = cycle_graph(rng, min_n=14, max_n=18)
    res = train_val_cycles(
        g, cyc, model_cfg(), epochs=3, lr=1e-2, seed=3,
    )
    assert len(res.history) == 3
    acc, auc, ap = res.test_metrics
    assert 0.0 <= acc <= 1.0
    assert np.isfinite(res.best_val) or np.isnan(res.best_val)


def test_train_val_cycles_regression_multilayer(rng):
    g, cyc = cycle_graph(rng, min_n=14, max_n=18)
    res = train_val_cycles_regression(
        g, cyc, model_cfg(multi_layer=True), epochs=3, lr=1e-2, seed=3,
    )
    mse, mae, rmse = res.test_metrics
    assert np.isfinite(mae) and mae >= 0
    assert abs(rmse - np.sqrt(mse)) < 1e-5
    assert res.best_val == min(h["val_mae"] for h in res.history)


def test_gc_trainer_flat(rng):
    graphs, cycles = [], []
    for _ in range(8):
        g, cyc = cycle_graph(rng)
        graphs.append(g)
        cycles.append(cyc)
    res = train_val_cycles_regression_GC(
        graphs, cycles, model_cfg(multi_layer=True),
        split_ratio=0.5, epochs=2, batch_size=2, lr=1e-2, seed=5,
    )
    assert len(res.history) == 2
    assert np.isfinite(res.test_metrics[1])


def test_gc_trainer_nested(rng):
    """Node-copy models emit segment rows; targets must land on the
    per-original-node segments."""
    ncfg = NodeSubgraphConfig(h=2)
    graphs, cycles = [], []
    for _ in range(6):
        g, cyc = cycle_graph(rng, min_n=6, max_n=9)
        graphs.append(create_node_subgraphs(g, ncfg))
        cycles.append(cyc)
    res = train_val_cycles_regression_GC(
        graphs, cycles, model_cfg(nested=True),
        split_ratio=0.5, epochs=2, batch_size=2, lr=1e-2, seed=5,
    )
    assert np.isfinite(res.test_metrics[1])
