"""Host-side batch prefetching.

The reference overlaps collation with compute via torch DataLoader worker
processes (`dataloader.py:24-48`). Here a single background thread builds
(and optionally device-puts) the next padded batches while the device
runs the current step — enough on TPU, where collation is cheap numpy and
the transfer is one contiguous H2D copy per array.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from escgnn_tpu.data.batching import (
    BatchSpec,
    batch_iterator,
    packed_batch_iterator,
)
from escgnn_tpu.data.container import GraphBatch, GraphData

_SENTINEL = object()


def prefetched_batches(
    graphs: Sequence[GraphData],
    spec: BatchSpec,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
    to_device: bool = True,
    packed: bool = False,
    depth: int = 2,
) -> Iterator[GraphBatch]:
    """Yield the same batches as `batch_iterator(graphs, spec, ...)`
    (or `packed_batch_iterator` with `packed=True`), built `depth` ahead
    on a background thread. `to_device=True` also issues the async H2D
    transfer from that thread so the consumer only enqueues compute."""
    it_fn = packed_batch_iterator if packed else batch_iterator
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []

    def produce():
        try:
            import jax
            import jax.numpy as jnp

            for b in it_fn(graphs, spec, shuffle=shuffle, rng=rng):
                if to_device:
                    b = jax.tree.map(jnp.asarray, b)
                q.put(b)
        except BaseException as e:  # propagate to the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is _SENTINEL:
            break
        yield b
    t.join()
    if err:
        raise err[0]


class _HostCachedBatches:
    """Padded host batches, device-put lazily on each iteration.

    Small splits (under `pin_bytes` total) are kept resident on the
    device instead — zero per-eval transfer. Larger splits stay in host
    memory so a big test set does not pin hundreds of padded batches in
    HBM for the whole run (the transfer is one contiguous H2D copy per
    array, a few ms per eval pass)."""

    def __init__(self, batches, pin: bool):
        import jax
        import jax.numpy as jnp

        if pin:
            batches = [jax.tree.map(jnp.asarray, b) for b in batches]
        self._batches = batches
        self._pin = pin

    def __len__(self):
        return len(self._batches)

    def __getitem__(self, i):
        import jax
        import jax.numpy as jnp

        b = self._batches[i]
        return b if self._pin else jax.tree.map(jnp.asarray, b)

    def __iter__(self):
        for i in range(len(self._batches)):
            yield self[i]


def materialized_batches(
    graphs: Sequence[GraphData],
    spec: BatchSpec,
    pin_bytes: int = 256 * 2**20,
):
    """Pad a FIXED set of graphs once and return a reusable batch
    iterable. Evaluation sets never reshuffle, so re-padding them every
    epoch only burns host time (the dedup layout's collation is
    ~65 ms/batch on 2 cores — comparable to a whole device step); with
    the padded batches cached, eval costs (at most) one H2D copy."""
    batches = list(batch_iterator(graphs, spec))
    total = sum(
        getattr(x, "nbytes", 0)
        for b in batches
        for x in _tree_leaves(b)
    )
    return _HostCachedBatches(batches, pin=total <= pin_bytes)


def _tree_leaves(b):
    import jax

    return jax.tree.leaves(b)


def _stack_host(batches: Sequence[GraphBatch]) -> GraphBatch:
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def stack_split(graphs: Sequence[GraphData], spec: BatchSpec,
                batch_transform=None) -> GraphBatch:
    """Pad a FIXED split once, stack along a new leading axis, and
    device-put: each eval/refresh pass over it is then ONE device
    dispatch (`lax.scan` over the leading axis in the pool_* steps),
    instead of one tunnel round trip per batch.

    `batch_transform` (host batch -> host batch) applies to every
    batch before stacking — e.g. the two-size bucketed copy re-layout
    with pinned region budgets (data/uniform_copies.py); all
    transformed batches must share one shape."""
    import jax
    import jax.numpy as jnp

    batches = list(batch_iterator(graphs, spec))
    if batch_transform is not None:
        batches = [batch_transform(b) for b in batches]
    return jax.tree.map(jnp.asarray, _stack_host(batches))


def stack_split_compressed(graphs: Sequence[GraphData], spec: BatchSpec,
                           batch_transform=None):
    """`stack_split` with lossless downcasting (data/compress.py):
    returns (device stack, decoder). Use for big eval splits that would
    otherwise pin f32 pools in HBM alongside a compressed train pool."""
    import jax
    import jax.numpy as jnp

    from escgnn_tpu.data.compress import compress_tree, make_decoder

    batches = list(batch_iterator(graphs, spec))
    if batch_transform is not None:
        batches = [batch_transform(b) for b in batches]
    host = _stack_host(batches)
    host, metas = compress_tree(host)
    return jax.tree.map(jnp.asarray, host), make_decoder(metas)


def stacked_batch_pools(
    graphs: Sequence[GraphData],
    spec: BatchSpec,
    k: int = 4,
    seed: int = 0,
    max_total_bytes: int = 4 * 2**30,
    compress: bool = False,
    batch_transform=None,
) -> tuple[list, int, "object"]:
    """K membership-shuffled STACKED device-resident train pools, the
    per-epoch batch count, and the device-side batch decoder.

    The stacked form of `materialized_batch_pools`: cycling pools across
    epochs (pool e % k, order-shuffled within via the scan's index
    vector) is the bounded-transfer stand-in for the reference's
    per-epoch membership reshuffle on the leaky-tunnel environment.
    All k pools live in HBM simultaneously, so k is capped to keep the
    total under `max_total_bytes` (a pool is the whole padded train
    split; 4 copies of a large split plus model/optimizer state can
    otherwise exceed a 16 GB v5e).

    `compress=True` stores the pools losslessly downcast (ESC counts /
    categorical features / block-local indices are small ints —
    data/compress.py, ~3x smaller on counting shapes); the returned
    decoder must then be passed to the pool step builders, which apply
    it on device per scanned batch. With `compress=False` the decoder
    is identity, so callers can thread it unconditionally."""
    import jax
    import jax.numpy as jnp

    from escgnn_tpu.data.compress import (
        compress_tree,
        compress_tree_like,
        make_decoder,
    )

    rng = np.random.default_rng(seed)
    pools: list = []
    decode = lambda tree: tree  # noqa: E731
    first_host = None
    kk = max(1, k)
    i = 0
    while i < kk:
        order = rng.permutation(len(graphs))
        shuffled = [graphs[int(j)] for j in order]
        bs_list = list(batch_iterator(shuffled, spec))
        if batch_transform is not None:
            # e.g. bucketed copy re-layout with PINNED region budgets
            # so every batch of every pool shares one compiled shape
            bs_list = [batch_transform(b) for b in bs_list]
        host = _stack_host(bs_list)
        if compress:
            if i == 0:
                host, metas = compress_tree(host)
                decode = make_decoder(metas)
                first_host = host
            else:
                # later pools must share pool 0's dtypes: one decoder,
                # one compiled epoch program across all pools
                host = compress_tree_like(host, first_host)
        if i == 0:
            per_pool = sum(x.nbytes for x in _tree_leaves(host))
            fit = max(1, int(max_total_bytes // max(per_pool, 1)))
            if fit < kk:
                print(
                    f"stacked_batch_pools: capping pools {kk} -> {fit} "
                    f"({per_pool / 2**20:.0f} MB per pool, "
                    f"budget {max_total_bytes / 2**30:.1f} GB)"
                )
                kk = fit
        pools.append(jax.tree.map(jnp.asarray, host))
        i += 1
    num_batches = (len(graphs) + spec.num_graphs - 1) // spec.num_graphs
    return pools, num_batches, decode


def materialized_batch_pools(
    graphs: Sequence[GraphData],
    spec: BatchSpec,
    k: int = 4,
    seed: int = 0,
    pin_bytes: int = 256 * 2**20,
) -> list:
    """K independently membership-shuffled batch pools of the same graphs.

    Cycling pools across epochs (pool e % k, order-shuffled within) is
    the bounded-transfer stand-in for the reference's per-epoch
    membership reshuffle: k pools cost k transfers total instead of one
    per epoch (each device_put leaks host RSS on the remote tunnel).
    k=1 degenerates to a fixed pool."""
    rng = np.random.default_rng(seed)
    pools = []
    for _ in range(max(1, k)):
        order = rng.permutation(len(graphs))
        shuffled = [graphs[int(i)] for i in order]
        pools.append(
            materialized_batches(shuffled, spec, pin_bytes=pin_bytes)
        )
    return pools
