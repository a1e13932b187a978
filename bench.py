"""Benchmark: image+text encode throughput per chip on the flagship model.

Runs the full ViT-B/32 CLIP + LinearHash heads (the shared compute path of
all 14 methods) in bfloat16 on the available device and reports pairs
encoded per second per chip.  Baseline target (BASELINE.md): >= 10,000
image+text encodes/sec/chip on v5e.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Secondary numbers (Hamming mAP eval latency over a synthetic COCO-sized
gallery) go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ccmh.clip.model import ClipConfig, init_clip_params, encode_image, encode_text
    from ccmh.models.heads import init_linear_hash, linear_hash
    from ccmh.ops.map_metric import calc_map
    from ccmh.ops.packing import sign_codes

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    cfg = ClipConfig()
    key = jax.random.PRNGKey(0)
    params = {
        "clip": init_clip_params(key, cfg),
        "img_head": init_linear_hash(jax.random.fold_in(key, 1), cfg.embed_dim, 64),
        "txt_head": init_linear_hash(jax.random.fold_in(key, 2), cfg.embed_dim, 64),
    }

    B = 512
    images = jnp.asarray(
        np.random.RandomState(0).randn(B, cfg.image_resolution, cfg.image_resolution, 3),
        jnp.float32)
    ids = np.zeros((B, 32), np.int32)
    ids[:, 0] = 49406
    ids[:, 1:31] = np.random.RandomState(1).randint(320, 40000, (B, 30))
    ids[:, 31] = 49407
    ids = jnp.asarray(ids)

    @jax.jit
    def encode_pairs(params, images, ids):
        img = encode_image(params["clip"], cfg, images, dtype=jnp.bfloat16)
        txt = encode_text(params["clip"], cfg, ids, dtype=jnp.bfloat16)
        hi = linear_hash(params["img_head"], img.astype(jnp.float32))
        ht = linear_hash(params["txt_head"], txt.astype(jnp.float32))
        return sign_codes(hi), sign_codes(ht)

    # warmup / compile
    t0 = time.time()
    out = encode_pairs(params, images, ids)
    jax.block_until_ready(out)
    log(f"compile+first batch: {time.time() - t0:.1f}s")

    n_iters = 20
    t0 = time.time()
    for _ in range(n_iters):
        out = encode_pairs(params, images, ids)
    jax.block_until_ready(out)
    elapsed = time.time() - t0
    encodes_per_sec = n_iters * B / elapsed
    log(f"encode throughput: {encodes_per_sec:,.0f} image+text pairs/s/chip "
        f"({elapsed / n_iters * 1e3:.1f} ms / {B}-batch)")

    # secondary: full-gallery Hamming mAP eval latency (COCO-sized)
    try:
        rng = np.random.RandomState(2)
        n_gallery, n_query, k = 117_218, 5000, 64
        qB = jnp.asarray((rng.randint(0, 2, (n_query, k)) * 2 - 1).astype(np.int8))
        rB = jnp.asarray((rng.randint(0, 2, (n_gallery, k)) * 2 - 1).astype(np.int8))
        qL = jnp.asarray((rng.rand(n_query, 80) < 0.1).astype(np.float32))
        rL = jnp.asarray((rng.rand(n_gallery, 80) < 0.1).astype(np.float32))
        v = float(calc_map(qB, rB, qL, rL, chunk=512))  # compile
        t0 = time.time()
        v = float(calc_map(qB, rB, qL, rL, chunk=512))
        map_time = time.time() - t0
        log(f"full-gallery COCO-sized mAP eval: {map_time:.3f}s (mAP={v:.4f}) "
            f"target <1s")
    except Exception as e:  # noqa: BLE001 - secondary metric must not kill bench
        log(f"mAP bench failed: {e}")

    print(json.dumps({
        "metric": "image+text encodes/sec/chip (ViT-B/32 bf16, K=64)",
        "value": round(encodes_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(encodes_per_sec / 10_000.0, 3),
    }))


if __name__ == "__main__":
    main()
