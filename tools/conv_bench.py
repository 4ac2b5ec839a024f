#!/usr/bin/env python
"""Time GINE message-passing alternatives at ZINC bench shapes on the chip.

The train step (bench.py) is ~5.2 ms with the z-emb reduce at ~0.9 ms; the
GINE conv stack is the dominant remainder. Candidates for the aggregation
  agg[i] = sum_{e: recv[e]=i} relu(x[send[e]] + eemb[e])
(reference PyG GINEConv semantics, `run_graphcount.py:77-109`):

  A. flat take + sorted segment_sum            (current, ops/segment.py)
  B. global one-hot bf16 matmuls               (MXU, but E*N sized)
  C. per-graph uniform layout batched einsums  (MXU, exploits the
     block-diagonal structure of the batched supergraph: a graph's edges
     only touch its own <=32 nodes)

Each is timed fwd and fwd+bwd with a lax.scan of 50 iterations on device
(single dispatch; tunnel-safe).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from escgnn_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(fn, args, iters=400, warm=True):
    """Run fn(args) `iters` times inside one on-device lax.scan; returns
    seconds/iter. fn must return a pytree; a scalar of it is carried to
    defeat DCE."""

    @jax.jit
    def run(args):
        def body(c, _):
            # perturb the first arg by the carry so the body is NOT
            # loop-invariant (XLA would otherwise hoist it out of the scan)
            first, rest = args[0], args[1:]
            out = fn(first + c.astype(first.dtype) * 1e-6, *rest)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out))
            return s * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    G, n, e, H = 128, 32, 96, 256
    N, E = G * n, G * e
    dt16 = jnp.bfloat16

    # block-diagonal graph structure: per-graph local indices
    send_l = rng.integers(0, n, (G, e)).astype(np.int32)
    recv_l = np.sort(rng.integers(0, n, (G, e)), axis=1).astype(np.int32)
    send = (send_l + np.arange(G)[:, None] * n).reshape(-1)
    recv = (recv_l + np.arange(G)[:, None] * n).reshape(-1)
    x = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32)).astype(dt16)
    eemb = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32)).astype(dt16)
    send_j, recv_j = jnp.asarray(send), jnp.asarray(recv)
    send_lj, recv_lj = jnp.asarray(send_l), jnp.asarray(recv_l)

    # --- A: flat take + sorted segment_sum
    def conv_a(x, eemb):
        msg = jax.nn.relu(jnp.take(x, send_j, axis=0) + eemb)
        return jax.ops.segment_sum(msg, recv_j, num_segments=N,
                                   indices_are_sorted=True)

    # --- B: global one-hot matmuls
    def conv_b(x, eemb):
        ar = jnp.arange(N, dtype=jnp.int32)
        oh_s = (send_j[:, None] == ar[None, :]).astype(dt16)  # E x N
        msg = jax.nn.relu(
            jnp.dot(oh_s, x, preferred_element_type=jnp.float32).astype(dt16)
            + eemb)
        oh_r = (recv_j[:, None] == ar[None, :]).astype(dt16)
        return jnp.dot(oh_r.T, msg, preferred_element_type=jnp.float32)

    # --- C: per-graph uniform einsums
    def conv_c(x, eemb):
        xg = x.reshape(G, n, H)
        eg = eemb.reshape(G, e, H)
        ar = jnp.arange(n, dtype=jnp.int32)
        oh_s = (send_lj[:, :, None] == ar[None, None, :]).astype(dt16)  # G,e,n
        gathered = jnp.einsum("gen,gnh->geh", oh_s, xg,
                              preferred_element_type=jnp.float32).astype(dt16)
        msg = jax.nn.relu(gathered + eg)
        oh_r = (recv_lj[:, :, None] == ar[None, None, :]).astype(dt16)
        agg = jnp.einsum("gen,geh->gnh", oh_r, msg,
                         preferred_element_type=jnp.float32)
        return agg.reshape(N, H)

    # harness floor: a trivial elementwise op on the same x
    def conv_0(x, eemb):
        return x.astype(jnp.float32) * 2.0

    variants = [("0 trivial x*2     ", conv_0),
                ("A flat take+segsum", conv_a),
                ("B global onehot mm", conv_b),
                ("C pergraph einsum ", conv_c)]

    # correctness cross-check (f32 reference on CPU-ish tolerance)
    ref = np.asarray(conv_a(x, eemb), dtype=np.float32)
    for name, fn in variants[2:]:
        got = np.asarray(fn(x, eemb), dtype=np.float32)
        err = np.abs(got - ref).max()
        print(f"{name}: max|diff| vs A = {err:.4f}")

    for name, fn in variants:
        t_f = scan_time(fn, (x, eemb))

        def loss(x, eemb, fn=fn):
            return jnp.sum(fn(x, eemb).astype(jnp.float32))
        g = jax.grad(loss, argnums=(0, 1))
        t_b = scan_time(g, (x, eemb))
        print(f"{name}: fwd {t_f*1e3:7.3f} ms   fwd+bwd {t_b*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
