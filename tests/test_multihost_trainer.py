"""FULL-Trainer multi-host end-to-end test (VERDICT r4 #5; SURVEY §2.6 DCN).

``test_two_process_distributed`` (tests/test_parallel.py) proves the raw
collective; this proves the PRODUCT: two real jax.distributed processes
(4 virtual CPU devices each, an 8-device global mesh) run the production
``Trainer.train()`` — deterministic loaders feeding the multihost-safe
``shard_batch``, ``valid()`` through the mesh-sharded on-device mAP, and
full-state checkpoint/resume gated to process 0 — and must agree with
each other AND with the single-process 8-device run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from ccmh.clip.model import ClipConfig
from ccmh.config import Config
from ccmh.train.trainer import Trainer

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_trainer_worker.py")


def _spawn(nproc, port, data_dir, save_dir, epochs, resume=False):
    # xla_cpu_collective_timeout_seconds: the default 30 s gloo rendezvous
    # window is shorter than the compile-time SKEW between two processes
    # compiling the same programs on this 1-core host — one process reaches
    # the collective while its peer is still compiling
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": ("--xla_force_host_platform_device_count=4 "
                         "--xla_cpu_collective_timeout_seconds=600 "
                         "--xla_cpu_collective_call_warn_stuck_timeout_seconds=300 "
                         "--xla_cpu_collective_call_terminate_timeout_seconds=1200")}
    cmd = lambda i: [sys.executable, WORKER, str(i), str(nproc), str(port),
                     data_dir, save_dir, str(epochs)] + (
                         ["--resume"] if resume else [])
    procs = [subprocess.Popen(cmd(i), stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(nproc)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    results = []
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-4000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    return results


def _reference(data_dir, save_dir, epochs, resume=False):
    cfg = Config(method="DSPH", dataset="synthetic", output_dim=16,
                 data_dir=data_dir, save_dir=save_dir, epochs=epochs,
                 batch_size=16, query_num=8, train_num=16, eval_batch=8,
                 valid=True, mesh_shape=(8,), checkpoint_every=1,
                 resume=resume, seed=1814, display_step=1000)
    t = Trainer(cfg, clip_cfg=ClipConfig.tiny())
    t.train()
    head_sum = float(jax.tree.reduce(
        lambda a, x: a + abs(x).sum(), t.state.params["img_head"], 0.0))
    return {"i2t": t.max_mapi2t, "t2i": t.max_mapt2i,
            "head_sum": head_sum, "step": int(t.state.step)}


@pytest.mark.slow
def test_multihost_full_trainer_train_valid_resume(tmp_path):
    from ccmh.data.synthetic import write_synthetic_mat_dataset

    data_dir = str(tmp_path / "data")
    write_synthetic_mat_dataset(data_dir, n=32, n_class=4,
                                resolution=ClipConfig.tiny().image_resolution)

    # single-process 8-device reference: 2 epochs, then +1 via resume
    ref_dir = str(tmp_path / "ref")
    want = _reference(data_dir, ref_dir, epochs=2)
    want3 = _reference(data_dir, ref_dir, epochs=3, resume=True)
    assert want3["step"] == want["step"] + 1   # resumed, not restarted

    save_dir = str(tmp_path / "mh")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    results = _spawn(2, port, data_dir, save_dir, epochs=2)

    # both processes agree with each other and with the single-process run
    for r in results:
        np.testing.assert_allclose(r["head_sum"], want["head_sum"],
                                   rtol=1e-4, err_msg=f"pid {r['pid']}")
        np.testing.assert_allclose(r["i2t"], want["i2t"], rtol=1e-3)
        np.testing.assert_allclose(r["t2i"], want["t2i"], rtol=1e-3)
        assert r["step"] == want["step"]
    assert results[0]["head_sum"] == results[1]["head_sum"]

    # process-0-only artifacts: checkpoint + per-process metrics streams
    assert os.path.isdir(os.path.join(save_dir, "state_ckpt"))
    assert os.path.exists(os.path.join(save_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(save_dir, "metrics.jsonl.p1"))

    # resume across the SAME process topology: one more epoch from the
    # process-0 checkpoint, still matching the single-process trajectory
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    results3 = _spawn(2, port, data_dir, save_dir, epochs=3, resume=True)
    for r in results3:
        assert r["step"] == want3["step"], r
        np.testing.assert_allclose(r["head_sum"], want3["head_sum"],
                                   rtol=1e-4, err_msg=f"pid {r['pid']}")
