"""Experiment logger — per-split metric accumulation + run logging.

Capability mirror of the reference's GraphGPS `CustomLogger`
(`GraphGPS/graphgps/logger.py:44-200`: per-split accumulation of
predictions/targets across batches, epoch summaries with
accuracy/AUC/AP/MAE, reduced-precision eval) and the root drivers'
`log.txt` appends (`run_graphcount.py:608`). A thin optional wandb hook
mirrors `custom_train.py:105-115` (gated: wandb is not a dependency).

Usage per split and epoch:
    lg = SplitLogger("val", task="classification")
    for batch: lg.update(pred, y, mask)
    stats = lg.epoch_summary()   # dict of metrics; resets the buffer
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

from escgnn_tpu.train.metrics import average_precision, rocauc


class SplitLogger:
    """Accumulates (pred, target) rows of one split across fixed-shape
    batches (only mask-selected rows are kept), then reduces to metrics."""

    def __init__(self, split: str, task: str = "regression"):
        self.split = split
        # regression | classification | multilabel | link
        self.task = task
        self._preds: list[np.ndarray] = []
        self._trues: list[np.ndarray] = []
        self._link_stats: list[dict] = []
        self._loss = 0.0
        self._n = 0
        self._t0 = time.time()

    def update_link_stats(self, stats: dict):
        """Accumulate one graph's ranking stats (mrr / hits@k from
        `train.metrics.graph_link_mrr`) — the reference CustomLogger's
        inductive-edge path collects `compute_mrr` outputs per batch
        and averages them at epoch end
        (`GraphGPS/graphgps/logger.py` + `head/inductive_edge.py:
        105-113`). Empty dicts (graphs with no positives) are skipped
        like the reference's empty stats."""
        if stats:
            self._link_stats.append(stats)

    def update(self, pred, true, mask, loss: Optional[float] = None):
        pred = np.asarray(pred)
        true = np.asarray(true)
        mask = np.asarray(mask).astype(bool)
        self._preds.append(pred[mask])
        self._trues.append(true[mask])
        if loss is not None:
            self._loss += float(loss) * int(mask.sum())
            self._n += int(mask.sum())

    def epoch_summary(self) -> dict:
        pred = np.concatenate(self._preds) if self._preds else np.zeros((0, 1))
        true = np.concatenate(self._trues) if self._trues else np.zeros((0, 1))
        out: dict = {"split": self.split, "n": int(pred.shape[0]),
                     "time_s": round(time.time() - self._t0, 2)}
        if self._n:
            out["loss"] = self._loss / self._n
        if self.task == "link":
            keys = sorted({k for s in self._link_stats for k in s})
            for k in keys:
                vals = [s[k] for s in self._link_stats if k in s]
                out[k] = float(np.mean(vals)) if vals else float("nan")
            out["n"] = len(self._link_stats)
            self._link_stats = []
            self._t0 = time.time()
            return out
        if pred.shape[0]:
            if self.task == "regression":
                out["mae"] = float(np.mean(np.abs(pred - true)))
                out["mse"] = float(np.mean((pred - true) ** 2))
            elif self.task == "classification":
                cls = pred.argmax(-1) if pred.ndim > 1 else (pred > 0)
                out["accuracy"] = float(
                    np.mean(cls.reshape(-1) == true.reshape(-1))
                )
            elif self.task == "multilabel":
                p2 = pred.reshape(pred.shape[0], -1)
                t2 = true.reshape(true.shape[0], -1)
                out["rocauc"] = rocauc(t2, p2)
                out["ap"] = average_precision(t2, p2)
        self._preds, self._trues = [], []
        self._loss, self._n = 0.0, 0
        self._t0 = time.time()
        return out


class RunLogger:
    """Appends per-epoch lines to log.txt + metrics.jsonl in the run dir;
    optional wandb mirroring when the package exists and enable_wandb."""

    def __init__(self, run_dir: str, enable_wandb: bool = False,
                 wandb_project: str = "escgnn_tpu", config: dict | None = None):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._wandb = None
        if enable_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(
                    project=wandb_project, dir=run_dir, config=config or {}
                )
            except Exception as e:  # wandb absent or offline failure
                print(f"wandb disabled: {e}")

    def log(self, epoch: int, **stats):
        line = {"epoch": epoch, **stats}
        with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(line) + "\n")
        msg = f"epoch {epoch:03d} " + " ".join(
            f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in stats.items()
        )
        with open(os.path.join(self.run_dir, "log.txt"), "a") as f:
            f.write(msg + "\n")
        if self._wandb is not None:
            self._wandb.log(stats, step=epoch)
        return msg

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
