"""bench.py perf-field computation (pure, no device timing).

Locks the roofline bookkeeping every BENCH_r* line carries:
mfu / hbm_bw_frac from the boundary bytes, the opcount field kept
separately, and binding_resource selection.
"""

import bench as B


def test_perf_fields_roofline_sides():
    # 10 iters in 1 s -> 0.1 s/step; peak 100 FLOP/s, bw 100 B/s
    f = B.perf_fields(
        times=[1.0], n_iter=10, real_edges=50, fps=2.0, peak=100.0,
        bps=9.0, bw=100.0, bps_opcount=30.0,
    )
    assert f["value"] == 500.0
    assert f["mfu"] == round(2.0 / 0.1 / 100.0, 4) == 0.2
    assert f["hbm_bw_frac"] == round(9.0 / 0.1 / 100.0, 4) == 0.9
    assert f["bytes_per_step"] == 9.0
    assert f["bytes_per_step_opcount"] == 30.0
    assert f["roofline_frac"] == 0.9
    assert f["binding_resource"] == "hbm_bw"


def test_perf_fields_flops_bound():
    f = B.perf_fields(
        times=[1.0], n_iter=10, real_edges=50, fps=9.0, peak=100.0,
        bps=2.0, bw=100.0,
    )
    assert f["binding_resource"] == "flops"
    assert f["roofline_frac"] == f["mfu"] == 0.9
    assert f["bytes_per_step_opcount"] is None


def test_perf_fields_missing_costs():
    f = B.perf_fields(
        times=[1.0, 1.2], n_iter=10, real_edges=50, fps=None, peak=None,
    )
    assert f["mfu"] is None and f["hbm_bw_frac"] is None
    assert f["roofline_frac"] is None and f["binding_resource"] is None
    assert f["windows"] == 2
