"""Worker for the REAL 2-process edge-partition test
(tests/test_multihost_ep_2proc.py) — VERDICT r04 weak #8: the novel
systems component (edge-partitioned supergraph + 2-D dp x ep) must
cross a real process boundary at least once.

Each process: 2 forced host-platform CPU devices; mode "multi" joins a
2-process jax.distributed slice (4 global devices), mode "single" runs
identically in one process with 4 local devices. Both build the same
deterministic batch and run, over the SAME global mesh shape:

  phase "ep":    2 train steps with edge arrays sharded over a
                 4-way 'model' axis (parallel/edge_partition.py);
  phase "dp_ep": 2 train steps on a 2x2 ('data','model') mesh —
                 graphs data-parallel, their edges partitioned.

Global arrays are assembled with `jax.make_array_from_callback`, so
each process transfers exactly the shards its devices own. stdout's
last line is a JSON record of per-phase losses + parameter checksums;
the parent asserts equality across modes and bit-equality across
ranks.

Usage: python multihost_ep_worker.py single
       python multihost_ep_worker.py multi <port> <process_id>
"""

import json
import os
import sys

mode = sys.argv[1]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count="
    + ("4" if mode == "single" else "2")
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

if mode == "multi":
    port, pid = sys.argv[2], int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch  # noqa: E402
from escgnn_tpu.data.counting import (  # noqa: E402
    CountingDatasetConfig,
    generate_counting_graphs,
    normalize_targets,
)
from escgnn_tpu.featurize.escgnn import EscConfig  # noqa: E402
from escgnn_tpu.featurize.transform import featurize_many  # noqa: E402
from escgnn_tpu.models.nested_gin_eff import (  # noqa: E402
    NestedGINEff,
    NestedGINEffConfig,
)
from escgnn_tpu.ops import zemb as zemb_mod  # noqa: E402
from escgnn_tpu.parallel.edge_partition import (  # noqa: E402
    batch_shardings,
    batch_shardings_2d,
    make_ep_train_step,
)
from escgnn_tpu.parallel.multihost import make_global_mesh  # noqa: E402
from escgnn_tpu.train.loop import (  # noqa: E402
    TrainState,
    adam_with_plateau,
    l1_node_loss,
)

# f32 zemb backward: exact cross-layout parity (same switch as
# tests/test_edge_partition.py)
zemb_mod.set_backward_matmul_dtype(jnp.float32)

# --- identical deterministic data on every process ---
splits = generate_counting_graphs(CountingDatasetConfig(num_graphs=16, seed=0))
splits, _, _ = normalize_targets(splits, 0)
feats = featurize_many(
    splits["train"][:4], EscConfig(h=2, use_rd=True, self_loop=True)
)
spec = BatchSpec.from_graphs(feats, batch_size=4)
batch_host = pad_and_batch(feats, spec)
# the sorted-CSR Pallas expansion assumes an unpartitioned edge axis;
# the GSPMD ep path drops it (shard_batch_by_edges does the same)
batch_host = batch_host.replace(enc_edge_perm=None, enc_row_sorted=None)


def global_put(tree, shardings):
    """Assemble globally-sharded arrays: each process materializes only
    the shards its devices own (make_array_from_callback slices the
    full deterministic host copy)."""

    def put(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx]
        )

    return jax.tree.map(put, tree, shardings)


def run_phase(mesh, shardings) -> dict:
    model = NestedGINEff(NestedGINEffConfig(hidden=16, num_layers=2))
    b_sh = global_put(batch_host, shardings)
    b1 = jax.tree.map(jnp.asarray, batch_host)  # local init copy
    variables = model.init(jax.random.key(0), b1)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(1e-3),
    )
    step = make_ep_train_step(
        model, l1_node_loss, mesh, b_sh, shardings=shardings
    )
    losses = []
    key = jax.random.key(3)
    for i in range(2):
        state, loss = step(state, b_sh, jax.random.fold_in(key, i))
        losses.append(float(np.asarray(
            loss.addressable_shards[0].data
            if hasattr(loss, "addressable_shards") else loss
        )))
    psum = float(sum(
        float(np.abs(np.asarray(
            x.addressable_shards[0].data
            if hasattr(x, "addressable_shards") else x
        )).sum())
        for x in jax.tree.leaves(state.params)
    ))
    return {"losses": losses, "param_checksum": psum}


# phase 1: 1-D edge partition over all 4 global devices
mesh_ep = make_global_mesh(("model",))
rec_ep = run_phase(mesh_ep, batch_shardings(batch_host, mesh_ep, "model"))

# phase 2: 2-D dp x ep (graphs over 'data', edges over both)
mesh_2d = make_global_mesh(("data", "model"), shape=(2, 2))
rec_2d = run_phase(
    mesh_2d, batch_shardings_2d(batch_host, mesh_2d, "data", "model")
)

print(json.dumps({
    "mode": mode,
    "process": jax.process_index(),
    "ep": rec_ep,
    "dp_ep": rec_2d,
}))
