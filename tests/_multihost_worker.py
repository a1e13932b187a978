"""Worker process for the 2-process jax.distributed test.

Spawned by tests/test_parallel.py::test_two_process_distributed as
``python tests/_multihost_worker.py <pid> <nproc> <port>``.  Each process
joins the cluster via ccmh's own initialize_multihost, contributes ITS half
of every global batch through shard_host_batch, and runs the replicated DP
train step over the global (cross-process) mesh — the DCN code path
executed for real, not as a single-process no-op.

The model/state/batches are pure functions of fixed seeds so the parent
pytest process can compute the single-device reference trajectory and
assert both workers reproduced it.
"""

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

STEPS, B, K, C = 3, 8, 8, 4


def build():
    """Deterministic (state, raw_step_fn, batches) — identical in every
    process and in the parent."""
    import jax
    import numpy as np

    from ccmh.clip.model import ClipConfig, init_clip_params
    from ccmh.config import Config
    from ccmh.train.methods import get_method
    from ccmh.train.state import init_state, make_main_optimizer, make_train_step

    tiny = ClipConfig.tiny()
    cfg = Config(method="DCHMT", output_dim=K, nclass=C, batch_size=B,
                 train_num=STEPS * B, epochs=1)
    method = get_method("DCHMT")
    key = jax.random.PRNGKey(0)
    heads, extra, aux = method.init(jax.random.fold_in(key, 1), cfg, tiny)
    params = {"clip": init_clip_params(key, tiny), **heads}
    tx = make_main_optimizer(cfg, params, steps_per_epoch=STEPS)
    extra_tx = method.extra_tx(cfg) if method.extra_tx else None
    state = init_state(jax.random.fold_in(key, 2), params, extra, aux, tx, extra_tx)
    raw_step = make_train_step(method.make_loss_fn(cfg, tiny), tx, extra_tx,
                               cfg, tiny, jit=False)

    rng = np.random.RandomState(5)
    batches = []
    for s in range(STEPS):
        batches.append({
            "image": (rng.randn(B, tiny.image_resolution, tiny.image_resolution, 3)
                      * 0.5).astype(np.float32),
            "text": rng.randint(1, tiny.vocab_size - 2, (B, 32)).astype(np.int32),
            "label": (rng.rand(B, C) < 0.4).astype(np.float32),
            "index": np.arange(s * B, (s + 1) * B, dtype=np.int32),
            "epoch": np.int32(0),
        })
    return state, raw_step, batches


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from ccmh.parallel.mesh import (
        data_parallel_train_step, initialize_multihost, make_mesh, replicate,
        shard_host_batch)

    n = initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert n == nproc, n
    assert jax.device_count() == 2 * nproc

    state, raw_step, batches = build()
    mesh = make_mesh()
    state = replicate(mesh, state)
    step = data_parallel_train_step(raw_step, mesh)

    lo, hi = pid * B // nproc, (pid + 1) * B // nproc
    losses = []
    for b in batches:
        import numpy as np

        local = {k: (v[lo:hi] if np.ndim(v) >= 1 else v) for k, v in b.items()}
        gb = shard_host_batch(mesh, local)
        state, metrics = step(state, gb)
        losses.append(float(metrics["loss"]))
    head_sum = float(jax.tree.reduce(
        lambda a, t: a + abs(t).sum(), state.params["img_head"], 0.0))
    print("RESULT " + json.dumps(
        {"pid": pid, "losses": losses, "head_sum": head_sum}), flush=True)


if __name__ == "__main__":
    main()
