"""SplitLogger / RunLogger tests."""

import json

import numpy as np

from escgnn_tpu.train.logger import RunLogger, SplitLogger


def test_split_logger_regression_masks_padding():
    lg = SplitLogger("val", task="regression")
    pred = np.asarray([[1.0], [2.0], [99.0]])
    true = np.asarray([[1.5], [2.5], [0.0]])
    lg.update(pred, true, mask=np.asarray([True, True, False]), loss=0.5)
    s = lg.epoch_summary()
    assert s["n"] == 2
    assert abs(s["mae"] - 0.5) < 1e-9
    assert abs(s["loss"] - 0.5) < 1e-9
    # buffer reset
    assert lg.epoch_summary()["n"] == 0


def test_split_logger_classification():
    lg = SplitLogger("test", task="classification")
    pred = np.asarray([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    true = np.asarray([0, 1, 1])
    lg.update(pred, true, mask=np.ones(3, bool))
    s = lg.epoch_summary()
    assert abs(s["accuracy"] - 2 / 3) < 1e-9


def test_split_logger_multilabel():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, (64, 3)).astype(float)
    scores = y + rng.normal(0, 0.3, y.shape)  # informative scores
    lg = SplitLogger("val", task="multilabel")
    lg.update(scores, y, mask=np.ones(64, bool))
    s = lg.epoch_summary()
    assert s["rocauc"] > 0.8
    assert s["ap"] > 0.8


def test_run_logger_files(tmp_path):
    rl = RunLogger(str(tmp_path))
    rl.log(1, loss=0.5, val_mae=1.25)
    rl.log(2, loss=0.25, val_mae=1.0)
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["val_mae"] == 1.0
    assert "epoch 002" in (tmp_path / "log.txt").read_text()
    rl.finish()


def test_split_logger_link_task_mrr_hits():
    from escgnn_tpu.train.logger import SplitLogger

    lg = SplitLogger("val", task="link")
    lg.update_link_stats({"mrr": 1.0, "hits@1": 1.0, "hits@10": 1.0})
    lg.update_link_stats({"mrr": 0.25, "hits@1": 0.0, "hits@10": 1.0})
    lg.update_link_stats({})  # no-positive graph: skipped
    out = lg.epoch_summary()
    assert out["mrr"] == 0.625
    assert out["hits@1"] == 0.5
    assert out["hits@10"] == 1.0
    assert out["n"] == 2
    # buffer reset
    assert lg.epoch_summary()["n"] == 0
