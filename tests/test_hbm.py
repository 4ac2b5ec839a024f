"""Fusion-boundary HBM traffic estimator (escgnn_tpu/utils/hbm.py).

Locks the parser against hand-written HLO (exact bytes) and against a
real CPU-compiled executable (sanity bounds + strictly below XLA's
per-op "bytes accessed" overcount on a fused program).
"""

import jax
import jax.numpy as jnp
import pytest

from escgnn_tpu.utils.hbm import (
    boundary_traffic,
    compiled_boundary_bytes,
    shape_bytes,
)

HLO = """\
HloModule m

%fused_computation (p0: f32[8,4]) -> f32[8,4] {
  %p0 = f32[8,4]{1,0} parameter(0)
  ROOT %t = f32[8,4]{1,0} tanh(%p0)
}

ENTRY %main (x: f32[8,4], w: f32[4,4]) -> (f32[8,4], bf16[4]) {
  %x = f32[8,4]{1,0} parameter(0)
  %w = f32[4,4]{1,0:T(8,128)} parameter(1)
  %dot = f32[8,4]{1,0} dot(%x, %w), lhs_contracting_dims={1}, rhs_contracting_dims={0}
  %fusion = f32[8,4]{1,0} fusion(%dot), kind=kLoop, calls=%fused_computation, metadata={op_name="tanh"}
  %c = bf16[4]{0} convert(%w), metadata={op_name="jit(f)/convert"}
  ROOT %out = (f32[8,4]{1,0}, bf16[4]{0}) tuple(%fusion, %c)
}
"""


def test_shape_bytes():
    assert shape_bytes("f32[8,4]") == 128
    assert shape_bytes("bf16[4]") == 8
    assert shape_bytes("pred[]") == 1
    assert shape_bytes("(f32[2,2], s8[3])") == 19
    assert shape_bytes("f32[8,4]{1,0:T(8,128)S(1)}") == 128


def test_boundary_traffic_hand_hlo():
    t = boundary_traffic(HLO)
    # dot: reads x (128) + w (64), writes 128
    # fusion: reads dot (128), writes 128
    # convert: reads w (64), writes 8
    # parameters + tuple: free
    assert t["reads"] == 128 + 64 + 128 + 64
    assert t["writes"] == 128 + 128 + 8
    assert t["bytes"] == t["reads"] + t["writes"]
    ops = {name: (r, w) for name, _, r, w in t["per_instruction"]}
    assert ops["dot"] == (192, 128)
    assert ops["fusion"] == (128, 128)
    assert ops["c"] == (64, 8)
    assert "x" not in ops and "out" not in ops


def test_boundary_traffic_nested_computations_ignored():
    # the fused computation's internal parameter/tanh must not be charged
    t = boundary_traffic(HLO)
    names = [r[0] for r in t["per_instruction"]]
    assert "p0" not in names and "t" not in names


def test_compiled_boundary_below_per_op_sum():
    def f(x, w):
        h = jnp.tanh(x @ w)
        return (h * h + h).sum()

    x = jnp.ones((64, 128), jnp.float32)
    w = jnp.ones((128, 128), jnp.float32)
    c = jax.jit(jax.grad(f, argnums=1)).lower(x, w).compile()
    bb = compiled_boundary_bytes(c)
    assert bb is not None
    # must at least move the two inputs and the gradient output once
    floor = x.nbytes + w.nbytes + w.nbytes
    assert bb >= floor
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    per_op = float(ca.get("bytes accessed", 0.0))
    if per_op > 0:
        # the boundary estimate must not exceed the per-op overcount
        assert bb <= per_op * 1.01


def test_no_entry_raises():
    with pytest.raises(ValueError):
        boundary_traffic("HloModule m\n")


HLO_WHILE = HLO.replace(
    "%fused_computation (p0: f32[8,4]) -> f32[8,4] {",
    """%while_body.1 (p: f32[2,2]) -> f32[2,2] {
  %p = f32[2,2]{1,0} parameter(0)
  ROOT %e = f32[2,2]{1,0} exponential(%p)
}

%fused_computation (p0: f32[8,4]) -> f32[8,4] {""",
)


def test_named_computation_traffic():
    t = boundary_traffic(HLO_WHILE, computation="while_body")
    # exponential: reads p (16), writes 16
    assert t["reads"] == 16 and t["writes"] == 16
    with pytest.raises(ValueError):
        boundary_traffic(HLO_WHILE, computation="no_such_comp")


def test_scan_body_bytes_compiled():
    from escgnn_tpu.utils.hbm import scan_body_bytes

    def step(s, x):
        return jnp.tanh(s @ x), jnp.sum(s)

    def loop(s, x):
        return jax.lax.scan(lambda c, _: (step(c, x)[0], 0.0), s,
                            jnp.arange(8))

    s = jnp.ones((64, 64), jnp.float32)
    x = jnp.ones((64, 64), jnp.float32)
    c = jax.jit(loop).lower(s, x).compile()
    sb = scan_body_bytes(c)
    assert sb is not None
    # the body must at least read both 16 KB operands and write one
    assert sb >= 3 * 64 * 64 * 4
