"""Shared helpers for the torch activation-parity suite.

Used by tests/test_torch_parity{,_ogb,_gps,_i2gnn}.py: float64 torch
re-implementations of the primitive blocks (dense, BatchNorm with given
running stats, the flax MLP stacking convention) plus the weight
randomization protocol. One definition so all four parity harnesses stay
in lockstep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    import torch
except ImportError:  # importorskip happens in the test modules
    torch = None


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def t_bn(x, p, s):
    """BatchNorm in eval mode: normalize with the given running stats."""
    return (x - t(s["mean"])) / torch.sqrt(t(s["var"]) + 1e-5) * t(
        p["scale"]
    ) + t(p["bias"])


def t_bn_train(x, p):
    """BatchNorm with the batch's OWN biased statistics (train mode)."""
    mean = x.mean(dim=0)
    var = x.var(dim=0, unbiased=False)
    return (x - mean) / torch.sqrt(var + 1e-5) * t(p["scale"]) + t(p["bias"])


def t_dense(x, p):
    return x @ t(p["kernel"]) + t(p["bias"])


def t_mlp(x, p, s, pre_act, act=None):
    """flax models.layers.MLP: optional pre [BN->act], then per feature
    Dense->BN->act. `s=None` uses train-mode batch statistics."""
    act = act or torch.relu
    bns = sorted(k for k in p if k.startswith("MaskedBatchNorm"))
    dns = sorted(k for k in p if k.startswith("TorchDense"))

    def bn(h, name):
        if s is None:
            return t_bn_train(h, p[name])
        return t_bn(h, p[name], s[name])

    bi = 0
    if pre_act:
        x = act(bn(x, bns[bi]))
        bi += 1
    for d in dns:
        x = t_dense(x, p[d])
        x = act(bn(x, bns[bi]))
        bi += 1
    return x


def randomize(tree, rng):
    """Replace every leaf with random values (weight-layout fuzzing)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [
        jnp.asarray(rng.normal(0.0, 0.5, leaf.shape).astype(np.float32))
        for leaf in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def abs_var(tree):
    """BN running variances must be positive: take |x| + 0.5."""

    def fix(path, leaf):
        if path[-1].key == "var":
            return jnp.abs(leaf) + 0.5
        return leaf

    return jax.tree_util.tree_map_with_path(fix, tree)
