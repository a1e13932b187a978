"""Op-level attribution of the encode path (the headline bench metric).

Traces the exact fori_loop-chained image+text encode that bench.py times
(ViT-B/32 + text tower, bf16, B=256) and aggregates device self-times per
op category via xprof's framework_op_stats, to show where the non-MXU time
goes before attempting any further kernel work (VERDICT r2 weak item 1 /
ROADMAP round-4 megakernel candidate).

Run on the real chip:  python tools/profile_encode.py [--out /tmp/enc_prof]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from bench import _bench_ids, _bench_images, log  # noqa: E402

B = 256


def aggregate(out_dir):
    """framework_op_stats -> (category, op) self-time table, printed."""
    import glob
    import gzip
    import json as _json

    import os

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:  # older image
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    paths = glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True)
    assert paths, "no xplane.pb found"
    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats^", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    table = _json.loads(data)
    # gviz table: table[0]['cols'] describe fields, ['rows'] hold values.
    t = table[0] if isinstance(table, list) else table
    cols = [c.get("label", c.get("id", "")) for c in t["cols"]]

    def col(name):
        for i, c in enumerate(cols):
            if name.lower() in c.lower():
                return i
        raise KeyError(f"{name} not in {cols}")

    i_hd = col("Host/device")
    i_cat, i_op, i_self = col("Operation Type"), col("Operation Name"), col("Total self-time (us)")
    by_cat = {}
    rows = []
    for r in t["rows"]:
        c = r["c"]
        if str(c[i_hd]["v"]).lower().startswith("host"):
            continue
        cat, op, selft = c[i_cat]["v"], c[i_op]["v"], float(c[i_self]["v"])
        by_cat[cat] = by_cat.get(cat, 0.0) + selft
        rows.append((selft, cat, op))
    total = sum(by_cat.values())
    log("-- self time by category --")
    for cat, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        log(f"  {cat:<32} {v:9.1f} us  {100 * v / total:5.1f}%")
    log("-- top 25 ops --")
    for selft, cat, op in sorted(rows, reverse=True)[:25]:
        log(f"  {selft:9.1f} us  {cat:<24} {op[:90]}")
    log(f"total device self time: {total / 1e3:.2f} ms (across traced iters)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/enc_prof")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--arch", choices=["vitb32", "vitl14"], default="vitb32",
                    help="tower preset (vitl14: the TP-scale tower, B=64)")
    ap.add_argument("--batch", type=int, default=0,
                    help="override batch size (default 256 / 64 for vitl14)")
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    from ccmh.clip.model import ClipConfig, encode_image, encode_text, init_clip_params
    from ccmh.models.heads import init_linear_hash, linear_hash

    log(f"device: {jax.devices()[0].device_kind}")
    cfg = ClipConfig() if args.arch == "vitb32" else ClipConfig.vit_l14()
    global B
    B = args.batch or (B if args.arch == "vitb32" else 64)
    log(f"arch {args.arch}, B={B}")
    key = jax.random.PRNGKey(0)
    params = {
        "clip": init_clip_params(key, cfg),
        "img_head": init_linear_hash(jax.random.fold_in(key, 1), cfg.embed_dim, 64),
        "txt_head": init_linear_hash(jax.random.fold_in(key, 2), cfg.embed_dim, 64),
    }
    images = _bench_images(B, cfg)
    ids = _bench_ids(B)

    def encode_pair(params, x, t):
        img = encode_image(params["clip"], cfg, x, dtype=jnp.bfloat16)
        txt = encode_text(params["clip"], cfg, t, dtype=jnp.bfloat16)
        hi = linear_hash(params["img_head"], img.astype(jnp.float32))
        ht = linear_hash(params["txt_head"], txt.astype(jnp.float32))
        return jnp.sum(hi) + jnp.sum(ht)

    @jax.jit
    def chained(params, x, t, n):
        def body(_, carry):
            x_c, t_c, acc = carry
            s = encode_pair(params, x_c, t_c)
            return (x_c + (s * 1e-24).astype(x_c.dtype),
                    t_c + jnp.int32(s * 1e-30),
                    acc + s)

        return jax.lax.fori_loop(0, n, body, (x, t, jnp.float32(0)))[2]

    float(chained(params, images, ids, 2))  # compile
    t0 = time.time()
    float(chained(params, images, ids, args.iters))
    log(f"timed: {(time.time() - t0) * 1e3 / args.iters:.2f} ms/iter (incl. fetch)")

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        float(chained(params, images, ids, args.iters))
    log(f"trace written to {args.out}")
    try:
        aggregate(args.out)
    except Exception as e:  # noqa: BLE001
        log(f"aggregation unavailable ({e}); inspect with tensorboard")


if __name__ == "__main__":
    main()
