"""Config system tests (defaults, YAML overlay, dotted overrides)."""

import pytest

from escgnn_tpu.config import agg_runs, dump_cfg, load_cfg, set_cfg


def test_defaults_tree():
    cfg = set_cfg()
    assert cfg.model.dim_h == 64
    assert cfg.dataset.esc.h == 3
    assert cfg.optim.scheduler == "plateau"


def test_yaml_overlay(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  dim_h: 128\noptim:\n  base_lr: 0.01\n")
    cfg = load_cfg(str(p))
    assert cfg.model.dim_h == 128
    assert cfg.optim.base_lr == 0.01
    assert cfg.model.num_layers == 4  # untouched default


def test_dotted_overrides():
    cfg = load_cfg(None, ["model.num_layers", "7", "train.batch_size", "16",
                          "dataset.esc.use_rd", "false"])
    assert cfg.model.num_layers == 7
    assert cfg.train.batch_size == 16
    assert cfg.dataset.esc.use_rd is False


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  dim_hh: 128\n")
    with pytest.raises(KeyError):
        load_cfg(str(p))


def test_type_coercion():
    cfg = load_cfg(None, ["optim.base_lr", "1e-2", "train.epochs", "3"])
    assert isinstance(cfg.optim.base_lr, float)
    assert isinstance(cfg.train.epochs, int)


def test_dump_and_reload(tmp_path):
    cfg = load_cfg(None, ["model.dim_h", "32"])
    dump_cfg(cfg, str(tmp_path))
    cfg2 = load_cfg(str(tmp_path / "config.yaml"))
    assert cfg2.model.dim_h == 32
    assert cfg2.to_plain() == cfg.to_plain()


def test_repo_config_parses():
    cfg = load_cfg("configs/gps/zinc-GPS.yaml")
    assert cfg.model.use_attn_bias is True


def test_agg_runs():
    agg = agg_runs([
        {"best_val_mae": 1.0, "best_epoch": 3},
        {"best_val_mae": 3.0, "best_epoch": 5},
    ])
    assert agg["best_val_mae_mean"] == 2.0
    assert agg["best_val_mae_std"] == 1.0
    assert agg["num_runs"] == 2


def test_linear_config_parses():
    cfg = load_cfg("configs/gps/zinc-GPS-linear.yaml")
    assert cfg.model.local_model == "gatedgcn"
    assert cfg.model.global_model == "linear"
    assert cfg.model.use_rwse is True
