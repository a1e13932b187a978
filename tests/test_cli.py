"""CLI end-to-end: synthetic on-disk dataset (reference .mat layout) ->
train one epoch -> valid -> artifacts on disk."""

import json
import os

import numpy as np
import pytest

from ccmh.cli import config_from_args, main
from ccmh.data.synthetic import write_synthetic_mat_dataset


def test_config_from_args(tmp_path):
    cfg = config_from_args([
        "--method", "DSPH", "--dataset", "coco", "--output-dim", "32",
        "--save-dir", str(tmp_path), "--epochs", "3",
        "--set", "dsph.alpha=0.5",
    ])
    assert cfg.method == "DSPH"
    assert cfg.output_dim == 32
    assert cfg.nclass == 80           # coco class count auto-filled
    assert cfg.epochs == 3
    assert cfg.dsph.alpha == 0.5
    assert cfg.save_dir == os.path.join(str(tmp_path), "DSPH", "coco", "32")


def test_cli_end_to_end(tmp_path):
    data_dir = write_synthetic_mat_dataset(str(tmp_path / "data"), n=48,
                                           n_class=6, resolution=32)
    trainer = main([
        "--method", "DCHMT", "--dataset", "synthetic", "--output-dim", "16",
        "--data-dir", data_dir, "--save-dir", str(tmp_path / "out"),
        "--epochs", "1", "--batch-size", "12", "--query-num", "12",
        "--train-num", "24", "--eval-batch", "12", "--clip-arch", "tiny",
    ])
    assert trainer.global_step == 2
    save_dir = trainer.cfg.save_dir
    assert os.path.exists(os.path.join(save_dir, "train.log"))
    assert os.path.exists(os.path.join(save_dir, "metrics.jsonl"))
    with open(os.path.join(save_dir, "metrics.jsonl")) as fh:
        events = [json.loads(line) for line in fh]
    assert any(e["event"] == "valid" for e in events)
    assert os.path.exists(
        os.path.join(save_dir, "PR_cruve", "16-ours-synthetic-i2t.mat"))
