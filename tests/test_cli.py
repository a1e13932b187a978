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
        "--set", "remat_policy=dots",   # dotless key = top-level field
    ])
    assert cfg.method == "DSPH"
    assert cfg.output_dim == 32
    assert cfg.nclass == 80           # coco class count auto-filled
    assert cfg.epochs == 3
    assert cfg.dsph.alpha == 0.5
    assert cfg.remat_policy == "dots"
    assert cfg.save_dir == os.path.join(str(tmp_path), "DSPH", "coco", "32")


def test_boolean_flags_reach_config():
    """Every boolean CLI flag whose dest names a Config field must actually
    flow through config_from_args — a parsed-but-dropped flag is a silent
    no-op (regression: --async-checkpoint was parsed and never forwarded)."""
    import argparse

    from ccmh.cli import build_parser
    from ccmh.config import Config

    fields = Config.__dataclass_fields__
    checked = 0
    for action in build_parser()._actions:
        if action.dest not in fields or not action.option_strings:
            continue  # dead reference-parity flags warn instead (cli.py)
        flag = action.option_strings[0]
        if isinstance(action, argparse._StoreTrueAction) and not action.default:
            assert getattr(config_from_args([flag]), action.dest) is True, flag
            checked += 1
        elif isinstance(action, argparse._StoreFalseAction) and action.default:
            assert getattr(config_from_args([flag]), action.dest) is False, flag
            checked += 1
    assert checked >= 10  # the boolean surface should stay covered


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


@pytest.mark.slow
def test_cli_nuswide_caption_txt(tmp_path):
    """NUS-WIDE-style dataset: captions in caption.txt (one line per item,
    dataset/dataloader.py:44-45) + MITH (key_padding_mask pipeline) —
    the driver's 'MITH on nuswide' config shape."""
    import numpy as np
    import scipy.io as scio
    from ccmh.data.synthetic import synthetic_arrays

    d = tmp_path / "data"
    d.mkdir()
    raw = synthetic_arrays(n=48, n_class=6, resolution=32)
    with open(d / "caption.txt", "w") as fh:
        for caps in raw.captions:
            fh.write(caps[0].replace("\n", " ") + "\n")
    np.save(d / "index.npy", raw.indexes)
    scio.savemat(d / "label.mat", {"category": raw.labels})

    trainer = main([
        "--method", "MITH", "--dataset", "nuswide_synth", "--output-dim", "16",
        "--data-dir", str(d), "--save-dir", str(tmp_path / "out"),
        "--epochs", "1", "--batch-size", "12", "--query-num", "12",
        "--train-num", "24", "--eval-batch", "12", "--clip-arch", "tiny",
        "--set", "mith.top_k_label=4",
    ])
    assert trainer.global_step == 2
    assert trainer.cfg.nclass == 6          # auto-filled from labels, not table
    assert 0.0 <= trainer.max_mapi2t <= 1.0


def test_tensorboard_events_written(tmp_path):
    """MetricsWriter mirrors jsonl records into TensorBoard event files —
    the populated version of the reference's never-written SummaryWriter
    (utils/logger.py:21-24)."""
    import os

    from ccmh.utils import MetricsWriter

    w = MetricsWriter(str(tmp_path / "m.jsonl"),
                      tensorboard_dir=str(tmp_path / "tb"))
    w.write("train", 1, loss=2.5, lr=1e-3)
    w.write("valid", 2, i2t=0.8)
    w.close()
    events = [f for f in os.listdir(tmp_path / "tb")
              if f.startswith("events.out.tfevents")]
    assert events, "no event files written"
    assert os.path.getsize(tmp_path / "tb" / events[0]) > 0


def test_cli_test_mode(tmp_path):
    """The --test surface (reference main.py is_train=False -> TrainBase.test,
    train/base.py:277-305): a CLI train run producing an orbax state_ckpt,
    then a second CLI invocation with --test --pretrained pointing at it —
    test.log, 4-way mAP line, and the .mat export must appear."""
    data_dir = write_synthetic_mat_dataset(str(tmp_path / "data"), n=48,
                                           n_class=6, resolution=32)
    common = [
        "--method", "DSPH", "--dataset", "synthetic", "--output-dim", "16",
        "--data-dir", data_dir, "--batch-size", "12", "--query-num", "12",
        "--train-num", "24", "--eval-batch", "12", "--clip-arch", "tiny",
    ]
    trainer = main(common + ["--save-dir", str(tmp_path / "out"),
                             "--epochs", "1", "--checkpoint-every", "1"])
    ckpt = os.path.join(trainer.cfg.save_dir, "state_ckpt")
    assert os.path.isdir(ckpt)

    t2 = main(common + ["--save-dir", str(tmp_path / "out_test"),
                        "--test", "--pretrained", ckpt])
    save_dir = t2.cfg.save_dir
    assert os.path.exists(os.path.join(save_dir, "test.log"))
    with open(os.path.join(save_dir, "test.log")) as fh:
        log_text = fh.read()
    assert "MAP(i->t)" in log_text
    assert os.path.exists(
        os.path.join(save_dir, "PR_cruve", "16-ours-synthetic-i2t.mat"))
    # PR/topN curves written next to the code dump, consistent with the
    # codes: recall reaches 1 at the max radius and the curves match a
    # recomputation from the dumped codes
    import numpy as np
    import scipy.io as scio

    from ccmh.ops.pr_curve import pr_curve

    dump = scio.loadmat(os.path.join(
        save_dir, "PR_cruve", "16-ours-synthetic-i2t.mat"))
    for direction in ("i2t", "t2i"):
        got = scio.loadmat(os.path.join(save_dir, "PR_cruve",
                                        f"curves-{direction}.mat"))
        assert abs(float(got["recall"].ravel()[-1]) - 1.0) < 1e-6
        qf, rf = (("q_img", "r_txt") if direction == "i2t"
                  else ("q_txt", "r_img"))
        want_p, want_r = pr_curve(dump[qf], dump[rf], dump["q_l"], dump["r_l"])
        np.testing.assert_allclose(got["precision"].ravel(), want_p, atol=1e-6)
        np.testing.assert_allclose(got["recall"].ravel(), want_r, atol=1e-6)
