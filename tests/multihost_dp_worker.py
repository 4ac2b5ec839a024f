"""Worker for the REAL 2-process multihost test (tests/test_multihost_2proc.py).

Each process: 2 forced host-platform CPU devices; mode "multi" joins a
2-process jax.distributed slice (4 global devices), mode "single" runs
the identical computation in one process with 4 local devices. Both
build the same deterministic data and run two dp train steps through
`parallel/multihost.py` + `parallel/data_parallel.py`; stdout's last
line is a JSON record of the losses and a parameter checksum, which the
parent asserts equal across modes (reference role: DistributedSampler +
DDP, kernel/train_eval.py:44-57).

Usage: python multihost_dp_worker.py single
       python multihost_dp_worker.py multi <port> <process_id>
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

# the hosting image's sitecustomize force-registers a TPU backend and
# overrides jax_platforms; the config update wins if applied before
# backend initialization (same dance as tests/conftest.py)
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
from jax.sharding import PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from escgnn_tpu.data.batching import BatchSpec, batch_iterator  # noqa: E402
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
from escgnn_tpu.parallel.data_parallel import (  # noqa: E402
    make_dp_train_step,
)
from escgnn_tpu.parallel.multihost import (  # noqa: E402
    host_local_to_global,
    make_global_mesh,
)
from escgnn_tpu.train.loop import (  # noqa: E402
    TrainState,
    adam_with_plateau,
    l1_node_loss,
)

# --- identical deterministic data on every process ---
splits = generate_counting_graphs(CountingDatasetConfig(num_graphs=24, seed=0))
splits, _, _ = normalize_targets(splits, 0)
feats = featurize_many(
    splits["train"][:8], EscConfig(h=2, use_rd=True, self_loop=True)
)
spec = BatchSpec.from_graphs(feats, batch_size=2)
batches = list(batch_iterator(feats, spec))  # 4 batches of 2 graphs
assert len(batches) == 4
stacked_host = jax.tree.map(lambda *xs: np.stack(xs), *batches)

mesh = make_global_mesh(("data",))
assert mesh.devices.size == 4

# each process feeds only ITS rows of the global [4, ...] stacked batch
pc = jax.process_count()
pi = jax.process_index()
local_rows = jax.tree.map(
    lambda a: a[pi * (4 // pc):(pi + 1) * (4 // pc)], stacked_host
)
stacked = host_local_to_global(local_rows, mesh, P("data"))

model = NestedGINEff(NestedGINEffConfig(
    hidden=16, num_layers=2, dropout=0.0, act="elu", graph_pred=False,
    use_x_embedding_jk=False, head_order="dropout_act",
))
b0 = jax.tree.map(jnp.asarray, batches[0])
var = model.init(jax.random.key(0), b0)
state = TrainState.create(
    var["params"], var.get("batch_stats", {}), adam_with_plateau(1e-3)
)
from escgnn_tpu.parallel.data_parallel import replicate_state  # noqa: E402

state = replicate_state(state, mesh)

step = make_dp_train_step(model, l1_node_loss, mesh)
rng = jax.random.key(1)
losses = []
for i in range(2):
    state, loss = step(state, stacked, jax.random.fold_in(rng, i))
    losses.append(float(np.asarray(loss.addressable_shards[0].data)))

psum = float(
    sum(
        float(np.abs(np.asarray(x.addressable_shards[0].data)).sum())
        for x in jax.tree.leaves(state.params)
    )
)
print(json.dumps({
    "mode": mode,
    "process": pi,
    "losses": losses,
    "param_checksum": psum,
}))
