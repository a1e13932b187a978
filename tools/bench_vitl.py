"""ViT-L/14-class encode throughput on one chip (the TP-scale tower).

The suite's methods all ship ViT-B/32 checkpoints, but the zoo now pins
the larger official releases (clip/zoo.py: ViT-L/14, @336px, RN50x64) and
tensor parallelism exists for exactly this tower class (docs/tp.md).
This tool measures the single-chip bf16 encode rate of the weight-free
ViT-L/14 architecture (ClipConfig.vit_l14()) with the same
hoisting-proof chained-loop methodology as bench.py, and reports the
sustained matmul TFLOP/s via the compiler's own cost analysis — the
number that says whether the big tower also runs at the MXU floor.

Usage: python tools/bench_vitl.py [B]   (default B=64)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(B: int = 64) -> None:
    try:
        from ccmh.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".xla_cache"))
    except Exception:  # noqa: BLE001
        pass
    import jax
    import jax.numpy as jnp

    from ccmh.clip.model import ClipConfig, encode_image, encode_text, init_clip_params

    cfg = ClipConfig.vit_l14()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}; "
        f"ViT-L/14 (vision {cfg.vision_layers}x{cfg.vision_width}, "
        f"{(cfg.image_resolution // cfg.vision_patch_size) ** 2 + 1} tokens; "
        f"text {cfg.transformer_layers}x{cfg.transformer_width}), B={B}")

    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    log(f"params: {n_params / 1e6:.0f}M")

    images = jnp.asarray(
        np.random.RandomState(0).randn(
            B, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32)
    ids = np.zeros((B, 32), np.int32)
    ids[:, 0] = 49406
    ids[:, 1:31] = np.random.RandomState(1).randint(320, 40000, (B, 30))
    ids[:, 31] = 49407
    ids = jnp.asarray(ids)

    def encode_pair(params, x, t):
        img = encode_image(params, cfg, x, dtype=jnp.bfloat16)
        txt = encode_text(params, cfg, t, dtype=jnp.bfloat16)
        return jnp.sum(img.astype(jnp.float32)) + jnp.sum(txt.astype(jnp.float32))

    @jax.jit
    def chained(params, x, t, n):
        # output feeds back into BOTH inputs: serializes iterations and
        # keeps both towers inside the loop (see bench.py methodology)
        def body(_, carry):
            x_c, t_c, acc = carry
            s = encode_pair(params, x_c, t_c)
            return (x_c + (s * 1e-24).astype(x_c.dtype),
                    t_c + jnp.int32(s * 1e-30),
                    acc + s)

        return jax.lax.fori_loop(0, n, body, (x, t, jnp.float32(0)))[2]

    # exact per-iteration FLOPs from the compiler (single unchained pair)
    one = jax.jit(encode_pair)
    try:
        flops = one.lower(params, images, ids).compile().cost_analysis()["flops"]
    except Exception:  # noqa: BLE001 - cost analysis is best-effort
        flops = None

    n_small, n_large = 2, 8
    float(chained(params, images, ids, n_small))  # compile (n is traced)
    per_iter = None
    for _ in range(3):
        t0 = time.time()
        float(chained(params, images, ids, n_small))
        t_s = time.time() - t0
        t0 = time.time()
        float(chained(params, images, ids, n_large))
        t_l = time.time() - t0
        per = (t_l - t_s) / (n_large - n_small)
        per_iter = per if per_iter is None else min(per_iter, per)

    rate = B / per_iter
    msg = (f"ViT-L/14 encode (bf16, B={B}): {per_iter * 1e3:.1f} ms/iter -> "
           f"{rate:,.0f} image+text pairs/s/chip")
    if flops is not None:
        msg += (f"; {flops / 1e9:.1f} GFLOP/iter -> "
                f"{flops / per_iter / 1e12:.0f} TFLOP/s sustained")
    log(msg)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
