"""Benchmark: image+text encode throughput per chip on the flagship model.

Runs the full ViT-B/32 CLIP + LinearHash heads (the shared compute path of
all 14 methods) in bfloat16 and reports pairs encoded per second per chip.
Baseline target (BASELINE.md): >= 10,000 image+text encodes/sec/chip on v5e.

Timing methodology: the axon relay used on this host can re-ship buffers
per call and its block_until_ready is unreliable for sub-ms kernels, so we
time a single jitted program that runs N forward passes inside a
lax.fori_loop whose carry chains BOTH the image and the token inputs to
the previous iteration's output (the compiler can neither elide, overlap,
nor hoist either tower out of the loop), and subtract the cost of a
shorter loop to cancel the fixed call overhead.

Prints ONE JSON line to stdout; secondary metrics (full-gallery Hamming mAP
eval latency) go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class _Skip(Exception):
    """Raised inside a bench section when the budget can't cover it (the
    skip line is printed by _Deadline.allow)."""


# set the moment the headline JSON lands on stdout; the watchdog consults it
# so a run that wedges BEFORE the headline yields an explicit error line and
# rc!=0, never a silent rc=0 the driver would record as success (ADVICE r4)
_HEADLINE_EMITTED = False


def _mark_headline():
    global _HEADLINE_EMITTED
    _HEADLINE_EMITTED = True


class _Deadline:
    """Aggregate wall-clock budget (round-3 postmortem: the driver kills
    the bench at its own timeout and records rc=124 — a truncated artifact
    — no matter how many lines already printed.  The bench must ALWAYS
    exit 0 before that).  Budget via CCMH_BENCH_BUDGET_S (default 1200 s);
    every secondary section declares a cost estimate and is skipped — with
    an explicit line, never silently — once the budget can't cover it.  A
    watchdog thread fires at budget + 180 s in case a section wedges on the
    relay: exit 0 if the headline JSON already reached stdout (parseable
    artifact), else an explicit error JSON line + exit 1 — a run that
    wedged before producing its metric must never read as success."""

    def __init__(self, budget_s: float):
        self.t0 = time.time()
        self.budget = budget_s

    def remaining(self) -> float:
        return self.budget - (time.time() - self.t0)

    def allow(self, est_s: float, what: str) -> bool:
        if self.remaining() >= est_s:
            return True
        log(f"bench budget: SKIPPED {what} (est {est_s:.0f}s > "
            f"{max(self.remaining(), 0):.0f}s left of {self.budget:.0f}s)")
        return False

    def arm_watchdog(self, grace_s: float = 180.0) -> None:
        import threading

        def _fire():
            if _HEADLINE_EMITTED:
                log(f"bench watchdog: {self.budget:.0f}s budget + "
                    f"{grace_s:.0f}s grace exceeded — forcing exit 0 "
                    f"(headline already on stdout)")
                sys.stderr.flush()
                sys.stdout.flush()
                os._exit(0)
            # wedged BEFORE the headline: a parseable error line + rc!=0 so
            # the driver records a broken run as broken, not as success
            log(f"bench watchdog: {self.budget:.0f}s budget + "
                f"{grace_s:.0f}s grace exceeded with NO headline — "
                f"emitting error line and exiting 1")
            print(json.dumps({
                "metric": "image+text encodes/sec/chip (ViT-B/32 bf16, K=64)",
                "value": 0, "unit": "pairs/s", "vs_baseline": 0.0,
                "error": "bench wedged before the headline metric "
                         "(watchdog fired)",
            }), flush=True)
            sys.stderr.flush()
            sys.stdout.flush()
            os._exit(1)

        t = threading.Timer(self.budget + grace_s - (time.time() - self.t0),
                            _fire)
        t.daemon = True
        t.start()


def _enable_repo_compile_cache():
    """Persistent XLA compile cache under the repo — works for the
    relay-attached TPU backend too (measured: a cold 147 s relay compile
    reloads in 0.5 s).  Makes driver bench re-runs warm, which is what
    keeps the whole script inside its budget."""
    try:
        from ccmh.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".xla_cache"))
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


def _bench_ids(B: int):
    import jax.numpy as jnp

    ids = np.zeros((B, 32), np.int32)
    ids[:, 0] = 49406
    ids[:, 1:31] = np.random.RandomState(1).randint(320, 40000, (B, 30))
    ids[:, 31] = 49407
    return jnp.asarray(ids)


def _bench_labels(B: int):
    import jax.numpy as jnp

    return jnp.asarray(
        (np.random.RandomState(4).rand(B, 80) < 0.1).astype(np.float32))


def _step_bench(name: str, clip_cfg, images, ids, labels, dsph_ms,
                remat: bool = False, B: int = 256):
    """Measure one method's FULL train step (bf16 towers + BertAdam).
    Returns (ms, raw_step, state, batch) or (None,)*4 on failure."""
    import jax
    import jax.numpy as jnp

    from ccmh.clip.model import init_clip_params
    from ccmh.config import Config
    from ccmh.train.methods import get_method
    from ccmh.train.state import init_state, make_main_optimizer, make_train_step

    try:
        t_cfg = Config(method=name, output_dim=64, nclass=80, batch_size=B,
                       train_num=4096, epochs=1, compute_dtype="bfloat16",
                       remat=remat)
        method = get_method(name)
        mkey = jax.random.PRNGKey(3)
        heads, extra, aux = method.init(mkey, t_cfg, clip_cfg)
        if "train_labels" in aux:  # MITH buffer losses need the full split
            aux["train_labels"] = jnp.asarray(
                (np.random.RandomState(6).rand(t_cfg.train_num, 80) < 0.1)
                .astype(np.float32))
        t_params = {"clip": init_clip_params(mkey, clip_cfg), **heads}
        tx = make_main_optimizer(t_cfg, t_params, steps_per_epoch=100)
        if method.grad_clip > 0:
            import optax as _optax

            tx = _optax.chain(_optax.clip_by_global_norm(method.grad_clip), tx)
        extra_tx = method.extra_tx(t_cfg) if method.extra_tx else None
        state = init_state(jax.random.fold_in(mkey, 9), t_params, extra, aux,
                           tx, extra_tx)
        raw_step = make_train_step(method.make_loss_fn(t_cfg, clip_cfg), tx,
                                   extra_tx, t_cfg, clip_cfg, jit=False)
        t_batch = {"image": images, "text": ids, "label": labels,
                   "index": jnp.arange(B, dtype=jnp.int32),
                   "epoch": jnp.asarray(0, jnp.int32)}
        if method.needs_mask:
            t_batch["key_padding_mask"] = ids == 0

        @jax.jit
        def run_steps(state, batch, n):
            # scalar loss accumulator: the relay's block_until_ready is
            # unreliable, a float() fetch is the dependable sync point
            def body(_, carry):
                s, acc = carry
                s2, m = raw_step(s, batch)
                return (s2, acc + m["loss"])
            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))[1]

        float(run_steps(state, t_batch, 2))
        best = None
        for _ in range(2):
            t0 = time.time()
            float(run_steps(state, t_batch, 2))
            ts = time.time() - t0
            t0 = time.time()
            float(run_steps(state, t_batch, 8))
            tl = time.time() - t0
            per = (tl - ts) / 6
            best = per if best is None else min(best, per)
        note = " [remat]" if remat else ""
        if dsph_ms is not None and best * 1e3 > 3 * dsph_ms:
            note += f" ({best * 1e3 / dsph_ms:.1f}x DSPH)"
        log(f"train step ({name}, B={B}, bf16 towers + BertAdam): "
            f"{best * 1e3:.1f} ms -> {B / best:,.0f} samples/s/chip{note}")
        return best * 1e3, raw_step, state, t_batch
    except Exception as e:  # noqa: BLE001
        log(f"train-step bench failed [{name}]: {e}")
        return None, None, None, None


def step_main(name: str, remat: bool, dsph_ms):
    """Subprocess entry: bench ONE method's train step and exit.  Heavy
    methods each get a fresh process because HBM held by a previous
    method's executables/donated buffers is not reliably released within
    one process on the relay-attached chip (observed: DPBE alone 110 ms;
    DPBE after the MITH bench -> RESOURCE_EXHAUSTED)."""
    from ccmh.clip.model import ClipConfig

    _enable_repo_compile_cache()
    B = 256
    clip_cfg = ClipConfig()
    images = _bench_images(B, clip_cfg)
    _step_bench(name, clip_cfg, images, _bench_ids(B), _bench_labels(B),
                dsph_ms, remat=remat, B=B)


def _bench_images(B: int, clip_cfg):
    import jax.numpy as jnp

    return jnp.asarray(
        np.random.RandomState(0).randn(
            B, clip_cfg.image_resolution, clip_cfg.image_resolution, 3),
        jnp.float32)


def _probe_backend(timeout_s: int = 900) -> bool:
    """Device enumeration in a SUBPROCESS with a hard timeout: the relay
    attaching the TPU has been observed to wedge for hours with
    jax.devices() hanging indefinitely, and a bench that never returns is
    worse for the driver than an honest failure line."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    dl = _Deadline(float(os.environ.get("CCMH_BENCH_BUDGET_S", "1200")))
    dl.arm_watchdog()
    if not _probe_backend(timeout_s=int(max(dl.budget / 2, 120))):
        log("backend probe failed: device enumeration hung/errored "
            "(relay wedged?) — emitting error line instead of hanging")
        print(json.dumps({
            "metric": "image_text_encodes_per_sec_per_chip", "value": 0,
            "unit": "pairs/s", "vs_baseline": 0.0,
            "error": "tpu backend unavailable (device enumeration timed out)",
        }), flush=True)
        sys.exit(1)

    _enable_repo_compile_cache()
    import jax
    import jax.numpy as jnp

    from ccmh.clip.model import ClipConfig, init_clip_params, encode_image, encode_text
    from ccmh.models.heads import init_linear_hash, linear_hash
    from ccmh.ops.map_metric import calc_map

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    cfg = ClipConfig()
    key = jax.random.PRNGKey(0)
    params = {
        "clip": init_clip_params(key, cfg),
        "img_head": init_linear_hash(jax.random.fold_in(key, 1), cfg.embed_dim, 64),
        "txt_head": init_linear_hash(jax.random.fold_in(key, 2), cfg.embed_dim, 64),
    }
    B = 256
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
            # feed the output back into BOTH next inputs: serializes the
            # iterations AND keeps the text tower inside the loop (with a
            # loop-invariant `t` XLA hoists the whole text encode out of the
            # fori_loop and the bench would count image-only iterations).
            x_c, t_c, acc = carry
            s = encode_pair(params, x_c, t_c)
            return (x_c + (s * 1e-24).astype(x_c.dtype),
                    t_c + jnp.int32(s * 1e-30),
                    acc + s)

        return jax.lax.fori_loop(0, n, body, (x, t, jnp.float32(0)))[2]

    n_small, n_large = 4, 24
    v = float(chained(params, images, ids, n_small))   # compile (n is traced)
    per_iter = None
    for _ in range(3):
        t0 = time.time()
        float(chained(params, images, ids, n_small))
        t_small = time.time() - t0
        t0 = time.time()
        float(chained(params, images, ids, n_large))
        t_large = time.time() - t0
        per = (t_large - t_small) / (n_large - n_small)
        per_iter = per if per_iter is None else min(per_iter, per)
    encodes_per_sec = B / per_iter
    log(f"encode throughput: {encodes_per_sec:,.0f} image+text pairs/s/chip "
        f"({per_iter * 1e3:.2f} ms / {B}-batch; loop {n_small}={t_small:.3f}s "
        f"{n_large}={t_large:.3f}s)")

    # primary metric FIRST: if the driver times the bench out mid-way the
    # headline JSON line is already on stdout; secondaries follow on stderr.
    print(json.dumps({
        "metric": "image+text encodes/sec/chip (ViT-B/32 bf16, K=64)",
        "value": round(encodes_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(encodes_per_sec / 10_000.0, 3),
    }), flush=True)
    _mark_headline()

    # secondary: serving-layer concurrent-request throughput — 48 clients
    # each sending ONE text query; dynamic micro-batching (ccmh/serve.py
    # _Batcher) coalesces them into a few device calls vs one B=1 XLA
    # call per request
    try:
        if not dl.allow(150, "serving bench"):
            raise _Skip
        from concurrent.futures import ThreadPoolExecutor

        from ccmh.config import Config as _SCfg
        from ccmh.retrieval import Retriever
        from ccmh.serve import RetrievalService
        from ccmh.train.methods import get_method

        s_cfg = _SCfg(method="DSPH", output_dim=64, nclass=80, max_words=32)
        s_method = get_method("DSPH")
        s_heads, _, s_aux = s_method.init(jax.random.PRNGKey(5), s_cfg, cfg)
        s_retr = Retriever(s_method, {"clip": params["clip"], **s_heads},
                           s_aux, s_cfg, cfg)
        s_texts = [f"a photo of object number {i} on a table" for i in range(48)]
        serial = RetrievalService(s_retr, batching=False)
        # the window closes the instant all 48 rows are queued (max_batch
        # == client count), so one group -> one warmed 48-row executable
        coalesced = RetrievalService(s_retr, batching=True, window_ms=300,
                                     max_batch=len(s_texts))
        # warm the two executable shapes (B=1 serial; 48-row coalesced)
        serial.encode({"texts": s_texts[:1]})
        coalesced.encode({"texts": s_texts})

        t_serial = None
        for _ in range(2):
            t0 = time.time()
            for t in s_texts:
                serial.encode({"texts": [t]})
            dt = time.time() - t0
            t_serial = dt if t_serial is None else min(t_serial, dt)
        t_batched = None
        with ThreadPoolExecutor(max_workers=len(s_texts)) as pool:
            for _ in range(2):
                t0 = time.time()
                list(pool.map(lambda t: coalesced.encode({"texts": [t]}),
                              s_texts))
                dt = time.time() - t0
                t_batched = dt if t_batched is None else min(t_batched, dt)
        st = coalesced._text_batcher.stats()
        log(f"serving text encode, {len(s_texts)} concurrent 1-text clients: "
            f"micro-batched {len(s_texts)/t_batched:,.0f} req/s "
            f"({st['batches']} device calls) vs serial "
            f"{len(s_texts)/t_serial:,.0f} req/s "
            f"({t_serial/t_batched:.1f}x)")

        # tail latency at a STATED offered load (VERDICT r4 #7): 16
        # closed-loop clients (offered load == achieved throughput in a
        # closed loop), single-text requests, 20 ms micro-batch window —
        # p50/p99 per request for encode and for top-10 search over a
        # 100k-code gallery (the daemon's two hot endpoints).
        from ccmh.retrieval import HashIndex as _HI

        gal = (np.random.RandomState(11).randint(0, 2, (100_000, 64)) * 2
               - 1).astype(np.int8)
        lat_svc = RetrievalService(s_retr, indexes={"image": _HI(gal)},
                                   batching=True, window_ms=20, max_batch=16)
        # steady-state measurement: coalesced batches land on power-of-2
        # row buckets (serve._bucket), so warm each bucket's executable
        # for both endpoints first — production tails after warmup, not
        # first-request XLA compiles
        for nb in (1, 2, 4, 8, 16):
            lat_svc.encode({"texts": s_texts[:nb]})
            lat_svc.search({"texts": s_texts[:nb], "index": "image", "k": 10})
        n_cli, n_req = 16, 8

        def _client(op, i):
            lats = []
            for j in range(n_req):
                body = {"texts": [s_texts[(i * n_req + j) % len(s_texts)]]}
                if op == "search":
                    body.update(index="image", k=10)
                t0 = time.time()
                (lat_svc.search if op == "search" else lat_svc.encode)(body)
                lats.append(time.time() - t0)
            return lats

        for op in ("encode", "search"):
            with ThreadPoolExecutor(max_workers=n_cli) as pool:
                t0 = time.time()
                lats = np.concatenate(list(
                    pool.map(lambda i: _client(op, i), range(n_cli))))
                wall = time.time() - t0
            extra = " (top-10, 100k gallery)" if op == "search" else ""
            log(f"serving {op}{extra} tail latency @ "
                f"{len(lats) / wall:,.0f} req/s offered by {n_cli} "
                f"closed-loop 1-text clients, 20 ms batch window: "
                f"p50 {np.percentile(lats, 50) * 1e3:.0f} ms, "
                f"p99 {np.percentile(lats, 99) * 1e3:.0f} ms")
        del s_retr, serial, coalesced, lat_svc
    except _Skip:
        pass
    except Exception as e:  # noqa: BLE001
        log(f"serving bench failed: {e}")

    # secondary: full training-step throughput per method (ViT-B/32, bf16
    # towers + BertAdam).  DSPH (the flagship line) runs here; the heavy
    # methods run LAST, each in its own subprocess (see end of main).
    labels = _bench_labels(B)
    dsph_ms, dsph_step, dsph_state, dsph_batch = _step_bench(
        "DSPH", cfg, images, ids, labels, None)

    # secondary: end-to-end input pipeline — decoded-tensor cache streaming a
    # real JPEG dataset into the DSPH train step (VERDICT item 4: the host
    # must sustain the device's step rate; uncached decode measured ~151
    # img/s on this 1-core host).  uint8 batches, normalize-on-device.
    try:
        if not dl.allow(360, "input-pipeline bench"):
            raise _Skip
        import shutil
        import tempfile

        from PIL import Image

        from ccmh.data.cache import ImageCache
        from ccmh.data.dataset import BatchIterator, CrossModalDataset
        from ccmh.data.split import RawData

        if dsph_step is None:
            raise RuntimeError("DSPH step unavailable")
        n_imgs = 1024
        rng = np.random.RandomState(8)
        tmp = tempfile.mkdtemp()
        paths = []
        for i in range(n_imgs):
            w, h = rng.randint(280, 520), rng.randint(280, 520)
            arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            p = os.path.join(tmp, f"{i}.jpg")
            Image.fromarray(arr).save(p, quality=88)
            paths.append(p)
        caps = np.empty(n_imgs, object)
        caps[:] = ["a photo of a thing" for _ in range(n_imgs)]
        raw = RawData(captions=caps, indexes=np.asarray(paths, object),
                      labels=(rng.rand(n_imgs, 80) < 0.1).astype(np.float32))
        ds = CrossModalDataset(raw, is_train=True, max_words=32, resolution=224)
        t0 = time.time()
        cache = ImageCache.build(ds, os.path.join(tmp, "cache"))
        t_build = time.time() - t0
        it = BatchIterator(ds, B, shuffle=True, num_workers=8,
                           image_cache=cache, drop_last=True)

        # host-only streaming rate (memmap gather + tokenize, no device)
        n_seen, t0 = 0, time.time()
        for _ in range(2):
            for b in it:
                n_seen += b["image"].shape[0]
        host_rate = n_seen / (time.time() - t0)

        # quantify the host->device link (the relay-attached chip on this
        # host serializes puts; on a PCIe-attached production host this is
        # multi-GB/s and the cached epoch tracks the pure step rate)
        probe = next(iter(it))["image"]
        jax.block_until_ready(jnp.asarray(probe))
        t0 = time.time()
        for _ in range(3):
            jax.block_until_ready(jnp.asarray(probe.copy()))
        t_put = (time.time() - t0) / 3
        put_rate = probe.nbytes / t_put / 2**20
        log(f"host->device put ({probe.nbytes / 2**20:.0f} MiB uint8 batch): "
            f"{t_put * 1e3:.0f} ms -> {put_rate:,.0f} MiB/s "
            f"(float32 batches would be 4x larger)")

        # fused epoch: cached loader feeding the real jitted DSPH step
        # through the double-buffered device-put pipeline (the put of batch
        # N+1 is enqueued while step N computes, data/prefetch.py) vs the
        # serialized put-then-step order
        import jax as _jax

        from ccmh.data.prefetch import device_prefetch

        step = _jax.jit(dsph_step, donate_argnums=(0,))
        epoch_zero = jnp.asarray(0, jnp.int32)

        def put(b):
            jb = {k: _jax.device_put(v) for k, v in b.items() if k != "valid"}
            jb["epoch"] = epoch_zero
            return jb

        state = dsph_state
        rates = {}
        for depth in (1, 2):
            n_seen, t0 = 0, time.time()
            for _ in range(2):
                it.set_epoch(n_seen + depth)  # distinct shuffles
                for jb in device_prefetch(it, put, depth=depth):
                    state, m = step(state, jb)
                    n_seen += B
            float(m["loss"])
            rates[depth] = n_seen / (time.time() - t0)
        epoch_rate = rates[2]
        pure = B / (dsph_ms / 1e3)
        log(f"input pipeline (decoded-tensor cache, {n_imgs} JPEGs @224): "
            f"build {t_build:.1f}s ({n_imgs / t_build:,.0f} img/s one-time), "
            f"host stream {host_rate:,.0f} samples/s, "
            f"cached epoch end-to-end {epoch_rate:,.0f} samples/s with "
            f"double-buffered puts vs {rates[1]:,.0f} serialized "
            f"({100 * epoch_rate / pure:.0f}% of the {pure:,.0f}/s pure step; "
            f"this host's relay put {put_rate:,.0f} MiB/s this run bounds "
            f"both)")

        # device-resident epochs (data/resident.py): one split-sized put,
        # then per-step host traffic is ids/labels only and the image batch
        # is gathered on-device — the mode the Trainer auto-selects when
        # the cached split fits HBM (VERDICT r3 item 3: the per-step put,
        # not decode, bounds this host)
        from ccmh.data.resident import (
            ResidentImages, make_resident_epoch_step, pack_epoch,
        )

        t0 = time.time()
        resident = ResidentImages(cache.images)
        t_pin = time.time() - t0
        it_meta = BatchIterator(ds, B, shuffle=True, num_workers=8,
                                image_cache=cache, drop_last=True,
                                with_images=False)
        # the Trainer's production resident path: the whole epoch's fused
        # host fields pin in ONE put, then every step is a single dispatch
        # slicing its row with a device-carried counter — ZERO per-step
        # host transfers, so the rate is immune to the relay's highly
        # variable put RTT (50 ms - >1 s observed across runs)
        stepper = make_resident_epoch_step(dsph_step)

        # warm-up OUTSIDE the timing: the first call compiles the fused
        # unpack+gather+step program (minutes through the remote-compile
        # relay when the persistent cache misses)
        it_meta.set_epoch(99)
        warm_groups = pack_epoch(
            [{k: v for k, v in b.items() if k != "valid"} for b in it_meta])
        for table_np, spec, n_rows in warm_groups:
            state, m, _ = stepper(
                state, _jax.device_put(table_np), spec,
                jnp.zeros((), jnp.int32), epoch_zero, resident.images)
        float(m["loss"])

        n_seen, t0 = 0, time.time()
        for ep in range(2):
            it_meta.set_epoch(100 + ep)
            for table_np, spec, n_rows in pack_epoch(
                    [{k: v for k, v in b.items() if k != "valid"}
                     for b in it_meta]):
                table = _jax.device_put(table_np)
                counter = jnp.zeros((), jnp.int32)
                for _ in range(n_rows):
                    state, m, counter = stepper(
                        state, table, spec, counter, epoch_zero,
                        resident.images)
                    n_seen += B
        float(m["loss"])
        res_rate = n_seen / (time.time() - t0)
        log(f"input pipeline [device-resident epochs]: pin "
            f"{resident.nbytes / 2**20:.0f} MiB once in {t_pin:.1f}s + one "
            f"{table_np.nbytes / 1024:.0f} KiB epoch table put, then "
            f"{res_rate:,.0f} samples/s end-to-end with zero per-step host "
            f"transfers ({100 * res_rate / pure:.0f}% of the {pure:,.0f}/s "
            f"pure step vs {100 * epoch_rate / pure:.0f}% streaming) "
            f"target >=80%")

        # chunked (hybrid) residency for OVER-BUDGET splits (VERDICT r4
        # #2): budget forced below the split size — pin a 95% region,
        # stream the rest once per epoch in double-buffered superblocks.
        # Per-epoch transfer degrades linearly in the over-budget fraction
        # (bw-bound floor: (split - region)/put_bw) instead of the
        # per-step streaming cliff.
        from ccmh.data.resident import (
            AsyncBlockPut, augment_chunked_batches, make_chunked_epoch_step,
        )

        r_rows = int(n_imgs * 0.95)
        m_rows = 64
        region = ResidentImages(np.ascontiguousarray(cache.images[:r_rows]))
        ck_stepper = make_chunked_epoch_step(dsph_step)
        row_shape = cache.images.shape[1:]

        def run_chunked_epoch(state, ep):
            it_meta.set_epoch(200 + ep)
            aug, sblocks, sb_of_batch = augment_chunked_batches(
                [{k: v for k, v in b.items() if k != "valid"}
                 for b in it_meta], r_rows, m_rows)
            putter = AsyncBlockPut()

            def start(g):
                buf = np.zeros((m_rows,) + tuple(row_shape), np.uint8)
                if len(sblocks[g]):
                    buf[: len(sblocks[g])] = cache.gather(sblocks[g])
                putter.start(g, buf)

            start(0)
            step, cur = 0, [None, None]
            for table_np, spec, n_rows in pack_epoch(aug):
                table = _jax.device_put(table_np)
                counter = jnp.zeros((), jnp.int32)
                for _ in range(n_rows):
                    g = sb_of_batch[step]
                    if cur[0] != g:
                        cur[1] = putter.get(g)
                        cur[0] = g
                        if g + 1 < len(sblocks):
                            start(g + 1)
                    state, m, counter = ck_stepper(
                        state, table, spec, counter, epoch_zero,
                        region.images, cur[1])
                    step += 1
            return state, m, step

        state, m, _ = run_chunked_epoch(state, -1)   # compile/warm
        float(m["loss"])
        n_seen, t0 = 0, time.time()
        for ep in range(2):
            state, m, steps = run_chunked_epoch(state, ep)
            n_seen += steps * B
        float(m["loss"])
        ck_rate = n_seen / (time.time() - t0)
        streamed_mb = (n_imgs - r_rows) * int(np.prod(row_shape)) / 2**20
        log(f"input pipeline [chunked resident, budget forced to 95% of "
            f"split]: pin {region.nbytes / 2**20:.0f} MiB region + stream "
            f"{streamed_mb:.0f} MiB/epoch in {m_rows}-row double-buffered "
            f"superblocks -> {ck_rate:,.0f} samples/s "
            f"({100 * ck_rate / pure:.0f}% of pure step vs "
            f"{100 * epoch_rate / pure:.0f}% per-step streaming; bw floor "
            f"{streamed_mb / max(put_rate, 1e-9) * 1e3:.0f} ms/epoch at this "
            f"run's {put_rate:,.0f} MiB/s put) target >=50%")
        del region
        # device-resident EVAL (data/resident.py ResidentEvalSplit): the
        # valid()/test() encode path pins the eval split's pixels+tokens
        # once and extracts the whole split's codes with ONE jitted scan
        # dispatch — zero host transfers per validation epoch (VERDICT r4
        # #1: the same put-bound disease resident epochs cured for
        # training).  Compared against the streaming get_code loop and the
        # pure encode rate (the headline chained-loop number).
        from ccmh.config import Config as _Cfg
        from ccmh.data.resident import (
            ResidentEvalSplit, make_resident_eval_encoder,
        )
        from ccmh.train.methods import get_method as _get_method

        # reference-scale split (query_num=5000): tile the JPEG set 3x so
        # the per-dispatch relay RTT (~30 ms fixed) amortizes as it does
        # on real splits — at 1024 items it alone cost 24% of the wall
        n_eval = 3 * n_imgs
        raw_eval = RawData(
            captions=np.concatenate([raw.captions] * 3),
            indexes=np.concatenate([raw.indexes] * 3),
            labels=np.concatenate([raw.labels] * 3))
        ds_eval = CrossModalDataset(raw_eval, is_train=False, max_words=32,
                                    resolution=224)
        cache_eval = ImageCache.build(ds_eval, os.path.join(tmp, "cache_ev"))
        e_method = _get_method("DSPH")
        e_cfg = _Cfg(method="DSPH", output_dim=64, nclass=80,
                     compute_dtype="bfloat16")
        from ccmh.clip.model import ClipConfig as _CC

        e_clip = _CC()
        t0 = time.time()
        split = ResidentEvalSplit(cache_eval, ds_eval, 256)
        t_pin_ev = time.time() - t0
        enc = make_resident_eval_encoder(
            lambda p, a, b: e_method.encode(p, a, b, e_cfg, e_clip), split)
        # `state` is the LIVE TrainState threaded through the step loops
        # above (dsph_state's original buffers were donated by them)
        e_params, e_aux = state.params, state.aux
        ic, tc = enc(e_params, e_aux)          # compile
        _jax.block_until_ready(tc)
        t0 = time.time()
        ic, tc = enc(e_params, e_aux)
        _jax.block_until_ready(tc)
        t_res_ev = time.time() - t0
        res_ev_rate = n_eval / t_res_ev

        # streaming comparator: the Trainer.get_code flow (batch puts +
        # per-batch jitted encode + host scatter), SAMPLED over the first
        # 4 batches — streaming is put-bandwidth-bound, so the rate
        # extrapolates and a full 3072-item pass would burn minutes of the
        # bench budget at this relay's worst observed 8 MiB/s
        it_ev = BatchIterator(ds_eval, 256, shuffle=False, num_workers=8,
                              image_cache=cache_eval)
        enc_step = _jax.jit(
            lambda p, a, b: e_method.encode(p, a, b, e_cfg, e_clip))
        bufs = np.zeros((n_eval, 64), np.int8)
        n_seen_ev = 0
        t0 = None
        for hb in it_ev:
            jb = {k: _jax.device_put(v) for k, v in hb.items()}
            i_c, t_c = enc_step(e_params, e_aux, jb)
            v = hb["valid"]
            bufs[hb["index"][v]] = np.asarray(i_c)[v]
            if t0 is None:
                t0 = time.time()   # batch 0 paid the compile; time from here
            else:
                n_seen_ev += int(v.sum())
            if n_seen_ev >= 1024:
                break
        stream_ev_rate = n_seen_ev / (time.time() - t0)
        pure_pct = 100 * res_ev_rate / encodes_per_sec
        log(f"valid() encode [device-resident eval]: pin "
            f"{split.nbytes / 2**20:.0f} MiB once in {t_pin_ev:.1f}s, then "
            f"{n_eval} items/{t_res_ev:.2f}s -> {res_ev_rate:,.0f} items/s "
            f"end-to-end in ONE dispatch ({pure_pct:.0f}% of the "
            f"{encodes_per_sec:,.0f}/s pure encode rate vs "
            f"{100 * stream_ev_rate / encodes_per_sec:.0f}% streaming) "
            f"target >=80%")
        del split, enc
        del resident
        shutil.rmtree(tmp, ignore_errors=True)
    except _Skip:
        pass
    except Exception as e:  # noqa: BLE001
        log(f"input-pipeline bench failed: {e}")

    # done with the DSPH step: free its params/opt state before the
    # gallery benches and the heavy per-method sweep below
    dsph_step = dsph_state = dsph_batch = None
    import gc as _gc

    _gc.collect()
    jax.clear_caches()

    # secondary: native C++ loader host decode throughput vs PIL
    try:
        if not dl.allow(60, "host decode bench"):
            raise _Skip
        import tempfile

        from PIL import Image
        from concurrent.futures import ThreadPoolExecutor

        from ccmh.data import native
        from ccmh.data.dataset import _to_pil, _transform

        if native.available():
            rng = np.random.RandomState(5)
            tmp = tempfile.mkdtemp()
            paths = []
            for i in range(64):
                w, h = rng.randint(300, 640), rng.randint(300, 640)
                arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
                p = os.path.join(tmp, f"{i}.jpg")
                Image.fromarray(arr).save(p, quality=90)
                paths.append(p)
            native.decode_batch(paths[:4], 224, True)
            t0 = time.time()
            native.decode_batch(paths, 224, True)
            t_native = time.time() - t0
            with ThreadPoolExecutor(max_workers=8) as pool:
                list(pool.map(lambda p: _transform(_to_pil(p), 224, True), paths[:4]))
                t0 = time.time()
                list(pool.map(lambda p: _transform(_to_pil(p), 224, True), paths))
                t_pil = time.time() - t0
            ncore = os.cpu_count() or 1
            log(f"host decode (C++ loader): {len(paths)/t_native:,.0f} images/s "
                f"on {ncore} core(s) vs PIL-threadpool {len(paths)/t_pil:,.0f} "
                f"({t_pil/t_native:.2f}x)")
        else:
            log("host decode: native loader unavailable (PIL path active)")
    except _Skip:
        pass
    except Exception as e:  # noqa: BLE001
        log(f"host decode bench failed: {e}")

    # secondary: host tokenizer throughput, native C++ BPE vs pure Python
    # (the serving daemon's text path tokenizes per request)
    try:
        if not dl.allow(40, "host tokenize bench"):
            raise _Skip
        from ccmh.tokenizer import native as bpe_native
        from ccmh.tokenizer.bpe import default_tokenizer

        if bpe_native.available():
            texts = [f"a photo of a dog number {i} on bright green grass"
                     for i in range(8000)]
            bpe_native.encode_padded_batch(texts[:64], 32)   # warm caches
            t0 = time.time()
            bpe_native.encode_padded_batch(texts, 32)
            t_nat = time.time() - t0
            tok = default_tokenizer()
            t0 = time.time()
            for t in texts[:1000]:
                tok.encode_padded(t, 32)
            t_py = (time.time() - t0) * (len(texts) / 1000)
            log(f"host tokenize (C++ BPE): {len(texts)/t_nat:,.0f} texts/s "
                f"vs python {len(texts)/t_py:,.0f} ({t_py/t_nat:.1f}x)")
        else:
            log("host tokenize: native BPE unavailable (python path active)")
    except _Skip:
        pass
    except Exception as e:  # noqa: BLE001
        log(f"host tokenize bench failed: {e}")

    # secondary: 1M-item synthetic gallery Hamming ranking at all three
    # supported code widths (BASELINE.md: 1M gallery x {16,32,64} bits)
    try:
        if not dl.allow(240, "1M-gallery benches"):
            raise _Skip
        from ccmh.ops.hamming import hamming_distance, hamming_distance_packed
        from ccmh.ops.packing import pack_codes

        rng = np.random.RandomState(7)
        n_gal, q_n = 1_000_000, 512
        for k in (16, 32, 64):
            qB = jnp.asarray((rng.randint(0, 2, (q_n, k)) * 2 - 1).astype(np.int8))
            rB = jnp.asarray((rng.randint(0, 2, (n_gal, k)) * 2 - 1).astype(np.int8))
            qP, rP = pack_codes(qB), pack_codes(rB)

            f_dense = jax.jit(lambda a, b: jnp.min(hamming_distance(a, b), axis=1))
            f_pack = jax.jit(lambda a, b: jnp.min(hamming_distance_packed(a, b), axis=1))
            for name, f, a, b in (("int8-MXU", f_dense, qB, rB),
                                  ("pallas-popcount", f_pack, qP, rP)):
                jax.block_until_ready(f(a, b))
                t0 = time.time()
                for _ in range(3):
                    out = f(a, b)
                jax.block_until_ready(out)
                dt = (time.time() - t0) / 3
                log(f"1M-gallery Hamming ranking [K={k}, {name}]: {dt * 1e3:.1f} ms "
                    f"for {q_n} queries -> {q_n / dt:,.0f} queries/s")

        # serving path: top-100 retrieval over the 1M gallery (stable
        # tie-broken ranking, ccmh/retrieval.py — device-resident index)
        from ccmh.retrieval import HashIndex

        index = HashIndex(np.asarray(rB))
        q_np = np.asarray(qB)
        index.search(q_np, 100)  # compile
        t0 = time.time()
        for _ in range(3):
            d_k, i_k = index.search(q_np, 100)
        dt = (time.time() - t0) / 3
        log(f"1M-gallery top-100 retrieval (K=64, int8-MXU index): "
            f"{dt * 1e3:.1f} ms for {q_n} queries -> {q_n / dt:,.0f} queries/s")

        # full expected-tie mAP at the 1M scale (64-bit, 512 queries)
        qL = jnp.asarray((rng.rand(q_n, 80) < 0.1).astype(np.float32))
        rL = jnp.asarray((rng.rand(n_gal, 80) < 0.1).astype(np.float32))
        v = float(calc_map(qB, rB, qL, rL, method="hist"))
        t0 = time.time()
        v = float(calc_map(qB, rB, qL, rL, method="hist"))
        log(f"1M-gallery mAP (K=64, {q_n} queries, hist): "
            f"{time.time() - t0:.3f}s (mAP={v:.4f})")
    except _Skip:
        pass
    except Exception as e:  # noqa: BLE001
        log(f"1M-gallery bench failed: {e}")

    # secondary: full-gallery Hamming mAP eval latency (COCO-sized)
    try:
        if not dl.allow(150, "COCO-sized mAP eval bench"):
            raise _Skip
        rng = np.random.RandomState(2)
        n_gallery, n_query, k = 117_218, 5000, 64
        qB = jnp.asarray((rng.randint(0, 2, (n_query, k)) * 2 - 1).astype(np.int8))
        rB = jnp.asarray((rng.randint(0, 2, (n_gallery, k)) * 2 - 1).astype(np.int8))
        qL = jnp.asarray((rng.rand(n_query, 80) < 0.1).astype(np.float32))
        rL = jnp.asarray((rng.rand(n_gallery, 80) < 0.1).astype(np.float32))
        times = {}
        for method in ("hist", "exact"):
            v = float(calc_map(qB, rB, qL, rL, method=method))  # compile
            best = None
            for _ in range(3):  # best-of-3: relay host-RTT noise is ~±20%
                t0 = time.time()
                v = float(calc_map(qB, rB, qL, rL, method=method))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[method] = best
            log(f"full-gallery COCO-sized mAP eval [{method}]: "
                f"{best:.3f}s (mAP={v:.4f}) target <1s")
        # device-vs-host breakdown for the exact line (VERDICT r4 #4): the
        # wall number above includes this host's relay round trips; chain
        # N whole exact computations inside ONE jitted fori_loop (rolled
        # queries defeat CSE) so the marginal per-iteration cost is PURE
        # device time — what a production (PCIe-attached) host would see.
        try:
            from ccmh.ops.map_metric import _map_chunk

            @jax.jit
            def chained_exact(qB, rB, qL, rL, n):
                def body(i, acc):
                    q = jnp.roll(qB, i, axis=0)   # defeat CSE across iters
                    ql = jnp.roll(qL, i, axis=0)
                    return acc + _map_chunk(q, rB, ql, rL, None, None)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            float(chained_exact(qB, rB, qL, rL, 1))   # compile
            dev = None
            for _ in range(2):
                t0 = time.time()
                float(chained_exact(qB, rB, qL, rL, 1))
                t1 = time.time() - t0
                t0 = time.time()
                float(chained_exact(qB, rB, qL, rL, 3))
                t3 = time.time() - t0
                per = (t3 - t1) / 2
                dev = per if dev is None else min(dev, per)
            log(f"full-gallery exact mAP device-time breakdown: "
                f"{dev:.3f}s on-chip per full 5000x117218 exact pass + "
                f"{max(times['exact'] - dev, 0):.3f}s host/relay overhead "
                f"in the wall number (on-chip {'MEETS' if dev < 1 else 'misses'} "
                f"the <1s target)")
        except Exception as e:  # noqa: BLE001
            log(f"exact-map breakdown failed: {e}")
        # reported-number policy (VERDICT r3 item 4): the hist line above is
        # the contract for the <1 s target — Trainer.valid sweeps every
        # epoch with hist and re-checks any best-epoch candidate within
        # EXACT_MARGIN=0.02 using the exact stable-sort metric
        # (trainer.py:valid; the estimator gap is bounded well inside the
        # margin by tests/test_ops.py::test_hist_estimator_error_bound);
        # Trainer.test() reports exact.  The exact sort itself sits at its
        # bitonic-pass bandwidth floor (ROADMAP: counting-sort and Pallas
        # variants measured no better in r3).
        log("mAP eval policy: hist is the per-epoch sweep (the <1s "
            "contract); exact runs only at best-epoch candidates "
            "(margin 0.02) and in test()")
    except _Skip:
        pass
    except Exception as e:  # noqa: BLE001 - secondary metric must not kill bench
        log(f"mAP bench failed: {e}")

    # per-method train-step sweep LAST, one SUBPROCESS each: HBM held by a
    # previous method's executables is not reliably released in-process on
    # the relay-attached chip, and an OOM in one heavy method must not
    # poison anything else.  MITH (the heaviest reference step,
    # train/MITH/hash_train.py:62-200) is tried WITHOUT remat first —
    # since the full scan unroll + head-stacked attention bwd its B=256
    # token pipeline fits 16 GB again (measured 99.3 ms vs 104.9 "dots" /
    # 115.1 full remat) — falling back to remat if HBM conditions differ.
    import subprocess

    # secondary: ViT-L/14-class tower (VERDICT r3 item 6 — the MFU-closure
    # argument was ViT-B-shaped; this puts the big-tower number in the
    # record).  Subprocess so its HBM is fully released before the sweep.
    if dl.allow(300, "ViT-L/14 encode bench"):
        try:
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "bench_vitl.py"), "64"],
                capture_output=True, text=True,
                timeout=max(dl.remaining() - 60, 120))
            got = False
            for line in r.stderr.splitlines():
                if line.startswith("ViT-L/14"):
                    log(line)
                    got = True
            if not got:
                log(f"ViT-L bench failed: exit {r.returncode}: "
                    f"{r.stderr[-300:]}")
        except subprocess.TimeoutExpired:
            log("ViT-L bench failed: subprocess timeout")

    def _run_step_bench(name, remat):
        cmd = [sys.executable, __file__, "--step", name]
        if remat:
            cmd.append("--remat")
        if dsph_ms is not None:
            cmd += ["--dsph-ms", f"{dsph_ms:.1f}"]
        try:
            # bounded by the aggregate budget (round-3 postmortem: four
            # serial 45-min-max subprocesses blew the driver timeout and
            # turned the whole artifact into rc=124)
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=max(dl.remaining() - 45, 60))
        except subprocess.TimeoutExpired:
            log(f"train-step bench failed [{name}]: subprocess timeout")
            return False
        ok = False
        for line in r.stderr.splitlines():
            if line.startswith("train step"):
                log(line)
                ok = True
            elif line.startswith("train-step bench failed") and not ok:
                log(line)
        if not ok and r.returncode != 0:
            log(f"train-step bench failed [{name}]: exit {r.returncode}: "
                f"{r.stderr[-300:]}")
        return ok

    sweep = ["MITH", "DPBE", "DGHDGH", "DHaPH"]
    for i, name in enumerate(sweep):
        if not dl.allow(240, f"train-step sweep [{name}]"):
            rest = sweep[i + 1:]
            if rest:
                log(f"bench budget: SKIPPED train-step sweep {rest} too")
            break
        if not _run_step_bench(name, remat=False) and name == "MITH":
            if dl.allow(240, "MITH --remat retry"):
                log("MITH retry with --remat (no-remat failed; likely HBM)")
                _run_step_bench(name, remat=True)



if __name__ == "__main__":
    if "--step" in sys.argv:
        _i = sys.argv.index("--step")
        _name = sys.argv[_i + 1]
        _dsph = (float(sys.argv[sys.argv.index("--dsph-ms") + 1])
                 if "--dsph-ms" in sys.argv else None)
        step_main(_name, "--remat" in sys.argv, _dsph)
    else:
        main()
