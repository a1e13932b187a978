"""Profile-attributed breakdown of the DSPH train step (VERDICT r2 item 4).

Two attributions of the B=256 bf16 DSPH step (the flagship hot loop,
matching bench.py's `train step (DSPH)` line):

1. component timing — separately compiled programs for
     a. loss forward only,
     b. value_and_grad (forward + backward),
     c. BertAdam update only (tx.update + apply_updates on captured grads),
   each timed with the fori_loop-chained methodology bench.py uses (the
   relay's block_until_ready is unreliable; a float() fetch of a scalar
   accumulator is the sync point);
2. op-level profile — a jax.profiler trace of the full step, aggregated to
   op categories with xprof/tensorboard_plugin_profile when parseable
   (written to --out for manual inspection either way).

Run on the real chip:  python tools/profile_step.py [--out /tmp/prof]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import _bench_ids, _bench_images, _bench_labels, log  # noqa: E402

B = 256


def timed_loop(fn, carry_init, n_small=2, n_large=8, repeats=2):
    """(seconds per iteration) for a carry-chained jitted loop of fn."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(carry, n):
        def body(_, c):
            return fn(c)
        return jax.lax.fori_loop(0, n, body, carry)

    def sync(c):
        leaf = jax.tree.leaves(c)[-1]
        return float(jnp.sum(leaf))

    sync(run(carry_init, 2))
    best = None
    for _ in range(repeats):
        t0 = time.time()
        sync(run(carry_init, n_small))
        ts = time.time() - t0
        t0 = time.time()
        sync(run(carry_init, n_large))
        tl = time.time() - t0
        per = (tl - ts) / (n_large - n_small)
        best = per if best is None else min(best, per)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dsph_profile")
    ap.add_argument("--method", default="DSPH")
    ap.add_argument("--unroll", type=int, default=0,
                    help="scan_unroll (0 = full unroll, the production "
                         "default; 1 = classic scan, faster compile)")
    ap.add_argument("--quick", action="store_true",
                    help="full-step timing only (skip components + trace)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ccmh.clip.model import ClipConfig, init_clip_params
    from ccmh.config import Config
    from ccmh.train.methods import get_method
    from ccmh.train.state import init_state, make_main_optimizer, make_train_step

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    clip_cfg = ClipConfig()
    cfg = Config(method=args.method, output_dim=64, nclass=80, batch_size=B,
                 train_num=4096, epochs=1, compute_dtype="bfloat16",
                 scan_unroll=args.unroll)
    method = get_method(args.method)
    key = jax.random.PRNGKey(3)
    heads, extra, aux = method.init(key, cfg, clip_cfg)
    params = {"clip": init_clip_params(key, clip_cfg), **heads}
    tx = make_main_optimizer(cfg, params, steps_per_epoch=100)
    extra_tx = method.extra_tx(cfg) if method.extra_tx else None
    state = init_state(jax.random.fold_in(key, 9), params, extra, aux, tx, extra_tx)
    loss_fn = method.make_loss_fn(cfg, clip_cfg)
    raw_step = make_train_step(loss_fn, tx, extra_tx, cfg, clip_cfg, jit=False)

    batch = {"image": _bench_images(B, clip_cfg), "text": _bench_ids(B),
             "label": _bench_labels(B),
             "index": jnp.arange(B, dtype=jnp.int32),
             "epoch": jnp.asarray(0, jnp.int32)}

    # ---- full step
    def full(c):
        s, acc = c
        s2, m = raw_step(s, batch)
        return (s2, acc + m["loss"])

    t_full = timed_loop(full, (state, jnp.float32(0)))
    log(f"full step (unroll={args.unroll}): {t_full * 1e3:.1f} ms "
        f"({B / t_full:,.0f} samples/s)")
    if args.quick:
        return

    # NOTE: every loop body must receive the big trees through the CARRY —
    # a closure-captured param tree becomes 150M of HLO *constants* and the
    # compile blows up past 30 minutes on the relay.

    # ---- forward only.  Chaining rng alone is NOT enough: most losses
    # ignore it, the whole body becomes loop-invariant and XLA hoists it
    # (this printed a nonsense ~0 ms).  Feed the loss back into the image
    # so every iteration depends on the previous one (bench.py's trick;
    # costs one [B, H, W, 3] add ≈ 0.2 ms, small vs the ~25 ms forward).
    def fwd(c):
        p, img, rng, acc = c
        rng2, srng = jax.random.split(rng)
        loss, _ = loss_fn(p, state.extra, state.aux,
                          {**batch, "image": img}, srng)
        return (p, img + (loss * 1e-24).astype(img.dtype), rng2, acc + loss)

    t_fwd = timed_loop(fwd, (state.params, batch["image"], state.rng,
                             jnp.float32(0)))
    log(f"loss forward: {t_fwd * 1e3:.1f} ms")

    # ---- forward + backward (no optimizer)
    def vg(c):
        p0, img, rng, acc = c
        rng2, srng = jax.random.split(rng)

        def wrapped(p, e):
            return loss_fn(p, e, state.aux, {**batch, "image": img}, srng)

        (loss, _), grads = jax.value_and_grad(
            wrapped, argnums=(0, 1) if state.extra is not None else 0,
            has_aux=True)(p0, state.extra)
        g = grads[0] if isinstance(grads, tuple) else grads
        gs = sum(jnp.sum(jnp.abs(x)) * 1e-20 for x in jax.tree.leaves(g))
        return (p0, img + (loss * 1e-24).astype(img.dtype), rng2,
                acc + loss + gs)

    t_vg = timed_loop(vg, (state.params, batch["image"], state.rng,
                           jnp.float32(0)))
    log(f"forward+backward: {t_vg * 1e3:.1f} ms (backward ~ {1e3 * (t_vg - t_fwd):.1f} ms)")

    # ---- optimizer only: chain BertAdam updates on fixed grads
    def wrapped0(p, e):
        return loss_fn(p, e, state.aux, batch, jax.random.PRNGKey(0))

    (_, _), grads0 = jax.jit(
        lambda p, e: jax.value_and_grad(
            wrapped0, argnums=(0, 1) if state.extra is not None else 0,
            has_aux=True)(p, e))(state.params, state.extra)
    g0 = grads0[0] if isinstance(grads0, tuple) else grads0

    def opt(c):
        p, o, g, acc = c
        updates, o2 = tx.update(g, o, p)
        p2 = __import__("optax").apply_updates(p, updates)
        # first leaf, not a named head: the head pytree differs per method
        # (--method MITH/TwDH have no img_head.w)
        return (p2, o2, g, acc + jnp.sum(jax.tree.leaves(updates)[0]))

    t_opt = timed_loop(opt, (state.params, state.opt_state, g0, jnp.float32(0)))
    log(f"BertAdam update: {t_opt * 1e3:.1f} ms")

    unattributed = t_full - t_vg - t_opt
    log(f"attribution: fwd {t_fwd * 1e3:.1f} + bwd {(t_vg - t_fwd) * 1e3:.1f} "
        f"+ optimizer {t_opt * 1e3:.1f} + unattributed/fusion-delta "
        f"{unattributed * 1e3:.1f} = {t_full * 1e3:.1f} ms")

    # ---- analytic floors (v5e: 197 TFLOP/s bf16, 819 GB/s HBM)
    # ~15.6 bf16 GFLOP per image+text pair forward: ViT-B/32 vision
    # (~2 * 87M params * 50 tokens / 32^2-patch amortization ≈ 13.1G) +
    # 32-token text tower (~2.4G) + heads; consistent with the measured
    # 17.1 ms fwd at the ~231 TFLOP/s sustained matmul rate.  bwd ~ 2x fwd.
    gflops_fwd = 15.6 * B
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state.params))
    opt_bytes = n_params * 4 * 7       # read p,g,m,v + write p,m,v (fp32)
    flop_note = "" if args.method == "DSPH" else (
        f" [FLOP model is DSPH's towers+LinearHash; {args.method}'s extra "
        f"modules add real matmul work on top, so its true floor is higher]")
    log(f"floors: fwd matmul ~{1e3 * gflops_fwd / 197e3:.1f} ms, "
        f"fwd+bwd ~{3 * 1e3 * gflops_fwd / 197e3:.1f} ms, "
        f"optimizer HBM ~{1e3 * opt_bytes / 819e9:.1f} ms "
        f"({n_params / 1e6:.0f}M params x 28 B){flop_note}")

    # ---- op-level trace
    import os

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        s, acc = state, jnp.float32(0)
        for _ in range(3):
            s, m = jax.jit(raw_step, donate_argnums=(0,))(s, batch)
        float(m["loss"])
    log(f"trace written to {args.out}")
    try:
        aggregate_trace(args.out)
    except Exception as e:  # noqa: BLE001
        log(f"trace aggregation unavailable ({e}); inspect with "
            f"tensorboard --logdir {args.out}")


def aggregate_trace(out_dir):
    """Aggregate the xplane trace to per-op-category device times (same
    working path as tools/profile_encode.py: xprof + pure-python protobuf;
    tensorboard_plugin_profile 2.13 is broken against the installed TF)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "profile_encode", os.path.join(os.path.dirname(__file__),
                                       "profile_encode.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.aggregate(out_dir)


if __name__ == "__main__":
    main()
