"""Worker for the FULL-Trainer 2-process jax.distributed test.

Spawned by tests/test_multihost_trainer.py as
``python tests/_multihost_trainer_worker.py <pid> <nproc> <port> <data_dir>
<save_dir> <epochs> [--resume]``.  Each process joins the cluster (4 CPU
devices each -> an 8-device global mesh), then runs the PRODUCTION
``Trainer.train()`` — loader, wrap-padded batches through the multihost-
safe shard_batch, valid() with the mesh-sharded on-device mAP, and
full-state checkpointing gated to process 0 — the configuration SURVEY
§2.6 names for DCN, not a raw-step smoke test.

Loaders are pure functions of (seed, epoch, item), so every process
assembles the IDENTICAL global batch and global_device_put lands only its
addressable rows.
"""

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_dir, save_dir, epochs = sys.argv[4], sys.argv[5], int(sys.argv[6])
    resume = "--resume" in sys.argv
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_default_matmul_precision", "highest")

    from ccmh.parallel.mesh import initialize_multihost

    n = initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert n == nproc, n
    assert jax.device_count() == 4 * nproc

    from ccmh.clip.model import ClipConfig
    from ccmh.config import Config
    from ccmh.train.trainer import Trainer

    cfg = Config(method="DSPH", dataset="synthetic", output_dim=16,
                 data_dir=data_dir, save_dir=save_dir, epochs=epochs,
                 batch_size=16, query_num=8, train_num=16, eval_batch=8,
                 valid=True, mesh_shape=(8,), checkpoint_every=1,
                 resume=resume, seed=1814, display_step=1000,
                 compilation_cache=os.path.join(save_dir, "..", "xc"))
    t = Trainer(cfg, clip_cfg=ClipConfig.tiny())
    t.train()
    head_sum = float(jax.tree.reduce(
        lambda a, x: a + abs(x).sum(), t.state.params["img_head"], 0.0))
    print("RESULT " + json.dumps({
        "pid": pid, "i2t": t.max_mapi2t, "t2i": t.max_mapt2i,
        "head_sum": head_sum, "step": int(t.state.step),
    }), flush=True)


if __name__ == "__main__":
    main()
