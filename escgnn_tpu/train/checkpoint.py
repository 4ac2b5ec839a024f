"""Orbax checkpointing.

Covers the reference's checkpoint story (`run_ogb_mol.py:440-452,504-510`):
periodic save every k epochs, best-val save, resume (continue_from), and
checkpoint ensembling at eval.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 20):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        # orbax spawns non-daemon background threads; an unclosed manager
        # can hang interpreter exit after the run completes (observed on
        # the mnist GPS CPU runs, 2026-08-21). Close at exit as a net.
        import atexit

        self._closed = False
        atexit.register(self.close)

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            try:
                self._mgr.close()
            except Exception:
                pass

    def save(self, step: int, tree: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree), force=force)
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def all_steps(self):
        return self._mgr.all_steps()

    def latest_step(self):
        return self._mgr.latest_step()


def restore_train_state(ckpt: CheckpointManager, state, step=None):
    """Restore a TrainState, tolerating optimizer-format drift.

    Exact template restore when the on-disk tree matches; otherwise
    (e.g. checkpoints written before the optax.flatten optimizer change)
    fall back to restoring the raw tree and grafting params/batch_stats/
    step onto the given state — the optimizer moments restart, which is
    the standard degradation for cross-format resume."""
    import jax
    import jax.numpy as jnp

    try:
        return ckpt.restore(step, template=state)
    except Exception:
        raw = ckpt.restore(step)
        if raw is None:
            return None
        kw = {}
        for field in ("params", "batch_stats"):
            if field in raw:
                kw[field] = jax.tree.map(jnp.asarray, raw[field])
        if "step" in raw:
            kw["step"] = jnp.asarray(raw["step"])
        return state.replace(**kw)
