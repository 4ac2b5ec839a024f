#!/usr/bin/env python
"""SR25 expressiveness check (TPU-native).

Mirror of reference `run_sr.py:233-245`: an *untrained* NestedGIN_eff must
produce pairwise-distinct graph embeddings for the 15 strongly regular
(25,12,5,6) graphs — 1-WL (and 3-WL) cannot distinguish them, so success
demonstrates the structural encoding's power. Failure count = number of
embedding pairs with L2 distance < tol.

Measured on the real SR25 data: at the reference's model scale
(8 layers, width 64 — their run_sr.py defaults) ALL 105 pairs are
separated (0 collisions, seeds 0 and 1). Note the bare encoding
MULTISET only separates 99/105 (6 pairs are bucket-identical, see
tests/test_expressiveness_data.py::test_sr25_encoding_separation_limit)
— the model exceeds that floor because message passing composes the
per-edge encodings with the actual topology. Small models (2 layers,
width 16) leave ~4 pairs numerically collided.
"""

from __future__ import annotations

import argparse

import jax

from escgnn_tpu.utils import setup_jax

setup_jax()  # persistent XLA compile cache
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.sr import load_sr_graphs
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import featurize_many
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig


def sr_collision_count(
    h: int = 3, hidden: int = 64, layers: int = 8, seed: int = 0,
    tol: float = 1e-2, path: str | None = None,
) -> tuple[int, int]:
    """Returns (num_indistinct_pairs, num_pairs)."""
    graphs = load_sr_graphs(path)
    ecfg = EscConfig(h=h, use_rd=True, self_loop=True)
    feats = featurize_many(graphs, ecfg, num_workers=2)
    spec = BatchSpec.from_graphs(feats, batch_size=len(feats))
    batch = jax.tree.map(jnp.asarray, pad_and_batch(feats, spec))

    model = NestedGINEff(
        NestedGINEffConfig(
            hidden=hidden,
            num_layers=layers,
            graph_pred=True,
            pool="add",
            use_x_embedding_jk=False,
            out_dim=hidden,
        )
    )
    variables = model.init(jax.random.key(seed), batch)
    emb = np.asarray(jax.jit(lambda v, b: model.apply(v, b))(variables, batch))
    emb = emb[np.asarray(batch.graph_mask)]
    # normalize scale so tol is meaningful across random inits
    emb = emb / (np.abs(emb).mean() + 1e-12)
    n = emb.shape[0]
    collisions = 0
    for i in range(n):
        for j in range(i + 1, n):
            if np.linalg.norm(emb[i] - emb[j]) < tol:
                collisions += 1
    return collisions, n * (n - 1) // 2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=3)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--path", default=None)
    args = p.parse_args()
    bad, total = sr_collision_count(
        args.h, args.hidden, args.layers, args.seed, path=args.path
    )
    print(f"SR25: {bad}/{total} indistinguishable pairs "
          f"({'PASS' if bad == 0 else 'FAIL'})")


if __name__ == "__main__":
    main()
