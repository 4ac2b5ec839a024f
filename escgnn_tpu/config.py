"""Config system — the GraphGPS/yacs-equivalent typed config stack.

Capability mirror of the reference's GraphGym config flow
(`GraphGPS/main.py:258-266` set_cfg/load_cfg/dump_cfg + the registered
extension groups in `GraphGPS/graphgps/config/*.py`): a nested defaults
tree, YAML overlay, dotted command-line overrides, and a dump of the
resolved config into the run directory.

Design: plain nested dicts with attribute access (`Cfg`), explicit
defaults per subsystem (dataset/model/train/optim/...), strict key
checking on merge (typos fail loudly instead of silently creating keys),
and type coercion from the default's type — no yacs dependency.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Iterable

import yaml


class Cfg(dict):
    """Dict with attribute access and strict nested merge."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def from_nested(d: dict) -> "Cfg":
        out = Cfg()
        for k, v in d.items():
            out[k] = Cfg.from_nested(v) if isinstance(v, dict) else v
        return out

    def merge(self, other: dict, path: str = "") -> None:
        """Merge `other` into self; unknown keys raise, scalar types are
        coerced to the default's type."""
        for k, v in other.items():
            full = f"{path}.{k}" if path else str(k)
            if k not in self:
                raise KeyError(f"unknown config key: {full}")
            cur = self[k]
            if isinstance(cur, Cfg):
                if not isinstance(v, dict):
                    raise TypeError(f"{full}: expected a mapping")
                cur.merge(v, full)
            else:
                self[k] = _coerce(v, cur, full)

    def to_plain(self) -> dict:
        return {
            k: (v.to_plain() if isinstance(v, Cfg) else v)
            for k, v in self.items()
        }


def _coerce(value: Any, default: Any, path: str) -> Any:
    if default is None or value is None:
        return value
    t = type(default)
    if isinstance(value, t):
        return value
    if t is bool:
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if t in (int, float):
        return t(value)
    if t is str:
        return str(value)
    if t in (list, tuple):
        return t(value)
    raise TypeError(f"{path}: cannot coerce {value!r} to {t.__name__}")


DEFAULTS = {
    "out_dir": "results/gps",
    "seed": 0,
    "run_multiple_splits": [],
    "dataset": {
        # zinc | zinc-synthetic | count_cycle | count_graphlet |
        # qm9-synthetic | mnist | cifar10 (superpixels) | aqsol |
        # vocsuperpixels | cocosuperpixels (LRGB node classification) |
        # peptides-func | peptides-struct (LRGB) |
        # ogbg-molhiv | ogbg-molpcba | ogbg-ppa | ogbg-code2 | malnet-tiny |
        # pcqm4mv2-{subset,full,inference} (OGB-LSC graph regression) |
        # pcqm4mv2contact-{shuffle,num-atoms} (inductive link prediction,
        # task: link) | ogbl-* (transductive link, task: link; one graph,
        # per-split labeled edge sets, num_graphs = synthetic node count) |
        # pattern | cluster (GNNBenchmark SBM node classification) |
        # wikipedia-{chameleon,squirrel}
        # (run_gps.build_dataset — the master_loader zoo)
        "name": "zinc-synthetic",
        "dir": "data",
        "num_graphs": 512,  # synthetic fallback size
        # regression | classification | multilabel |
        # node_classification (VOC/COCO, macro-F1) |
        # sequence (code2 sub-token heads, F1) |
        # link (inductive edge prediction, MRR + hits@k)
        "task": "regression",
        "target": 0,  # y column for counting / qm9
        "node_encoder": "embed",
        "edge_encoder": "embed",
        # ESC structural pre-transform (reference utils_escgnn.py)
        "esc": {"enable": True, "h": 3, "use_rd": True, "self_loop": True,
                "max_nodes_per_hop": 0},
        "attn_bias": True,  # all-pairs SPD matrix for biased attention
    },
    "model": {
        "type": "GPSModel",
        "dim_h": 64,
        "num_layers": 4,
        "num_heads": 4,
        "dropout": 0.0,
        "attn_dropout": 0.0,
        "local_model": "gine",  # gine | gatedgcn | pna
        # transformer | linear | performer (FAVOR+) | bigbird | san |
        # san2 | graphormer
        "global_model": "transformer",
        "san_gamma": 1e-5,
        "performer_features": 64,
        "use_equivstable_pe": False,
        "pna_towers": 4,
        "avg_deg_log": 0.0,  # 0 -> computed from the train split (pna)
        "bigbird_window": 3,
        "bigbird_global": 2,
        "bigbird_random": 2,
        "use_esc": True,
        "use_attn_bias": True,
        "use_lap_pe": False,
        "use_signnet": False,
        "use_rwse": False,
        "use_degree": False,
        "pool": "add",
        "graph_pred": True,  # False -> node-level head (counting)
        "out_dim": 1,
        "node_vocab": 100,
        "edge_vocab": 100,
    },
    "posenc": {  # featurize-time positional encodings (posenc.py)
        "lap_pe_k": 8,
        "rwse_k": 16,
    },
    "train": {
        "batch_size": 32,
        "epochs": 100,
        "eval_period": 1,
        "ckpt_period": 20,
        "ckpt_best": True,
        "auto_resume": False,
    },
    "optim": {
        "base_lr": 1e-3,
        "weight_decay": 0.0,
        "scheduler": "plateau",  # plateau | cosine | none
        "lr_decay_factor": 0.5,
        "patience": 10,
        "min_lr": 1e-5,
    },
    "metric": "mae",  # mae | accuracy | ap | auc (auc: multilabel ROC-AUC)
    "num_runs": 1,  # multi-seed aggregation (reference main.py:270)
    # finetune from a pretrained checkpoint (reference
    # GraphGPS/graphgps/config/pretrained_config.py + the loading logic
    # in main.py/custom_train): restore params from `dir`'s checkpoint,
    # optionally re-initialize the prediction head, optionally freeze
    # everything except the head
    "pretrained": {
        "dir": "",
        "reset_prediction_head": True,
        "freeze_main": False,
    },
}


def set_cfg() -> Cfg:
    return Cfg.from_nested(copy.deepcopy(DEFAULTS))


def load_cfg(
    yaml_path: str | None = None, opts: Iterable[str] = ()
) -> Cfg:
    """Build the resolved config: defaults <- YAML file <- dotted opts.

    `opts` come in pairs: ["optim.base_lr", "0.01", "train.epochs", "50"].
    """
    cfg = set_cfg()
    if yaml_path:
        with open(yaml_path) as f:
            cfg.merge(yaml.safe_load(f) or {})
    opts = list(opts)
    if len(opts) % 2:
        raise ValueError("opts must be key value pairs")
    for key, val in zip(opts[::2], opts[1::2]):
        tree: dict = {}
        cur = tree
        parts = key.split(".")
        for p in parts[:-1]:
            cur[p] = {}
            cur = cur[p]
        cur[parts[-1]] = yaml.safe_load(val)
        cfg.merge(tree)
    return cfg


def dump_cfg(cfg: Cfg, out_dir: str) -> None:
    """Write the resolved config into the run dir (reference dump_cfg)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg.to_plain(), f, sort_keys=False)


def agg_runs(results: list[dict]) -> dict:
    """Multi-seed aggregation (reference `main.py:309` agg_runs): mean and
    std of every numeric metric across runs."""
    import numpy as np

    keys = [
        k for k, v in results[0].items() if isinstance(v, (int, float))
    ]
    agg = {}
    for k in keys:
        vals = np.asarray([r[k] for r in results], np.float64)
        agg[f"{k}_mean"] = float(vals.mean())
        agg[f"{k}_std"] = float(vals.std())
    agg["num_runs"] = len(results)
    return agg
