"""Trainer orchestration: epoch loop, on-device validation, checkpoints.

Functional replacement for the reference TrainBase (train/base.py:15-349)
plus each method's train_epoch.  Differences by design:

* the whole train step (CLIP fwd x2 + heads + loss + backward + both
  optimizer updates) is ONE jitted XLA program (vs per-op torch dispatch);
* validation mAP runs entirely on device (ops/map_metric.py) instead of the
  reference's CPU python-loop (utils/calc_utils.py:16-39);
* codes are extracted with a jitted encode step and scattered into host
  buffers by dataset index (parity with train/base.py:130-148);
* checkpointing: weights-only .npz for --pretrained interchange (parity
  with the reference's .pth dumps, train/base.py:225-227) PLUS orbax
  full-state checkpoints (params, both optimizer states, aux, step, rng,
  epoch) every ``checkpoint_every`` epochs with --resume auto-recovery —
  the failure-recovery subsystem the reference lacks (SURVEY §5).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.io as scio

from ccmh.clip.convert import load_clip_params, save_params_npz, _flatten, _unflatten
from ccmh.clip.model import ClipConfig, init_clip_params
from ccmh.config import Config
from ccmh.data.dataset import BatchIterator, CrossModalDataset
from ccmh.data.split import SplitData, make_splits
from ccmh.ops.map_metric import calc_map_4way
from ccmh.train.methods import get_method
from ccmh.train.state import TrainState, init_state, make_main_optimizer, make_train_step
from ccmh.utils import MetricsWriter, get_logger


class Trainer:
    def __init__(
        self,
        cfg: Config,
        *,
        splits: Optional[SplitData] = None,
        clip_cfg: Optional[ClipConfig] = None,
        clip_params=None,
    ):
        self.cfg = cfg
        if getattr(cfg, "compilation_cache", ""):
            from ccmh.utils.compile_cache import enable_compilation_cache

            enable_compilation_cache(cfg.compilation_cache)
        os.makedirs(cfg.save_dir, exist_ok=True)
        # multi-host (multi-controller) runs: every process executes the
        # same Trainer; files that must be written once (checkpoints, .mat,
        # csv) are gated to process 0, and per-process streams (log,
        # metrics) get a ".pN" suffix so they never interleave
        self.process_index = jax.process_index()
        self.is_lead = self.process_index == 0
        psuf = f".p{self.process_index}" if not self.is_lead else ""
        self.logger = get_logger(
            os.path.join(cfg.save_dir,
                         ("train.log" if cfg.is_train else "test.log") + psuf))
        self.metrics = MetricsWriter(
            os.path.join(cfg.save_dir, "metrics.jsonl" + psuf),
            tensorboard_dir=os.path.join(cfg.save_dir, "tensorboard" + psuf))
        self.method = get_method(cfg.method)

        # resolve the tower checkpoint BEFORE the datasets: the transform
        # resolution is a hard shape constraint of the loaded tower (e.g.
        # ViT-L/14@336px or an HF checkpoint at a non-224 size), so the
        # data pipeline must follow the checkpoint, not the 224 default.
        if clip_params is None and cfg.clip_path:
            clip_params, clip_cfg = load_clip_params(cfg.clip_path)
        if clip_cfg is not None and clip_cfg.image_resolution != cfg.resolution:
            self.logger.warning(
                f"--resolution {cfg.resolution} does not match the "
                f"{clip_cfg.image_resolution}px CLIP tower; using "
                f"{clip_cfg.image_resolution}")
            cfg.resolution = clip_cfg.image_resolution

        self._init_data(splits)
        self._init_model(clip_cfg, clip_params)

        self.global_step = 0
        self._preempt = False
        self._async_saver = None  # lazy AsyncStateSaver (--async-checkpoint)
        self.max_mapi2t = 0.0
        self.max_mapt2i = 0.0
        self.best_epoch_i = 0
        self.best_epoch_t = 0
        self.total_time = 0.0

    # ------------------------------------------------------------------ data
    def _init_data(self, splits: Optional[SplitData]):
        cfg = self.cfg
        if splits is None:
            if not cfg.data_dir:
                raise ValueError("provide data_dir or explicit splits")
            caption = os.path.join(
                cfg.data_dir,
                "caption.txt" if "nuswide" in cfg.dataset else "caption.mat")
            index = os.path.join(cfg.data_dir, "index.mat")
            npy = False
            if not os.path.exists(index):
                index = os.path.join(cfg.data_dir, "index.npy")
                npy = True
            label = os.path.join(cfg.data_dir, "label.mat")
            splits = make_splits(caption, index, label, cfg.query_num,
                                 cfg.train_num, cfg.seed, npy=npy)
        self.splits = splits
        kw = dict(max_words=cfg.max_words, resolution=cfg.resolution,
                  with_mask=self.method.needs_mask)
        self.train_data = CrossModalDataset(splits.train, is_train=True, seed=cfg.seed, **kw)
        self.query_data = CrossModalDataset(splits.query, is_train=False, seed=cfg.seed, **kw)
        self.retrieval_data = CrossModalDataset(splits.retrieval, is_train=False, seed=cfg.seed, **kw)
        self.query_labels = self.query_data.all_labels()
        self.retrieval_labels = self.retrieval_data.all_labels()
        self.cfg.retrieval_num = len(self.retrieval_labels)
        if self.cfg.nclass == 0:
            self.cfg.nclass = self.query_labels.shape[1]

        nw = getattr(cfg, "num_workers", 8)
        caches = {"train": None, "query": None, "retrieval": None}
        if getattr(cfg, "cache_images", False):
            # decode each split ONCE into a uint8 memmap; epochs then stream
            # from it and normalization moves on-device (data/cache.py)
            from ccmh.data.cache import open_or_build

            base = cfg.cache_dir or os.path.join(
                cfg.data_dir or cfg.save_dir, "_ccmh_cache")
            for split, ds in (("train", self.train_data),
                              ("query", self.query_data),
                              ("retrieval", self.retrieval_data)):
                caches[split] = open_or_build(ds, base, split, num_workers=nw,
                                              logger=self.logger)
            self.logger.info(f"decoded-tensor image caches ready under {base}")
        # single-chip training uses the true-size (ragged) final batch —
        # exact reference semantics for batch-statistics losses at the cost
        # of one extra compile; under a mesh the remainder rarely divides
        # the devices, so those runs keep the wrap-padded fixed shape.
        ragged = getattr(cfg, "ragged_last", True) and not (
            cfg.mesh_shape and cfg.mesh_shape[0] > 1)
        # device-resident epochs (data/resident.py): runs with a decoded
        # cache pin the train split to HBM once (row-sharded over a DP
        # mesh); the loader then skips host image assembly and the fused
        # resident step gathers pixels on-device from each batch's
        # indices.  tp/fsdp runs keep streaming (their batch/state
        # shardings don't compose with the resident stepper).  The
        # decision happens here (the loader needs it); the pin itself
        # waits for _init_model, where the mesh exists.
        tp = cfg.mesh_shape[1] if len(cfg.mesh_shape) > 1 else 1
        dp = cfg.mesh_shape[0] if cfg.mesh_shape else 1
        # multi-controller runs stream for now: the resident tables would
        # need per-process local-shard pinning (a natural extension; the
        # transport falls back to the multihost-safe shard_batch path)
        unsupported = (tp > 1 or bool(getattr(cfg, "fsdp", False))
                       or jax.process_count() > 1)
        self.train_resident = None
        self._resident_source = None
        self._chunked_source = None
        self._split_caches = caches   # eval residency planned in _init_model
        if caches["train"] is not None:
            from ccmh.data.resident import ResidentImages

            mode = getattr(cfg, "device_resident_images", "auto")
            if ResidentImages.plan(
                    caches["train"],
                    budget_mb=getattr(cfg, "device_resident_budget_mb", 6144),
                    mode=mode,
                    ndev=max(dp, 1), unsupported_transport=unsupported,
                    logger=self.logger):
                self._resident_source = caches["train"]
            elif mode == "auto" and not unsupported:
                # over-budget split on a supported transport: HYBRID
                # residency (data/resident.py chunked mode) — pin what the
                # budget allows, stream the rest once per epoch in
                # double-buffered superblock buffers instead of the
                # per-step put cliff
                self._chunked_source = caches["train"]
        self.train_loader = BatchIterator(
            self.train_data, cfg.batch_size,
            shuffle=getattr(cfg, "shuffle", True), seed=cfg.seed,
            num_workers=nw, image_cache=caches["train"], ragged_last=ragged,
            with_images=(self._resident_source is None
                         and self._chunked_source is None))
        self.query_loader = BatchIterator(
            self.query_data, cfg.eval_batch, shuffle=False, seed=cfg.seed,
            num_workers=nw, image_cache=caches["query"])
        self.retrieval_loader = BatchIterator(
            self.retrieval_data, cfg.eval_batch, shuffle=False, seed=cfg.seed,
            num_workers=nw, image_cache=caches["retrieval"])

    # ----------------------------------------------------------------- model
    def _init_model(self, clip_cfg: Optional[ClipConfig], clip_params):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        if clip_params is None:
            # __init__ already resolved cfg.clip_path (the resolution must be
            # known before the datasets), so reaching here means no checkpoint
            clip_cfg = clip_cfg or ClipConfig()
            self.logger.warning("no clip_path set — random CLIP init")
            clip_params = init_clip_params(rng, clip_cfg)
        self.clip_cfg = clip_cfg

        k_head, k_state = jax.random.split(jax.random.fold_in(rng, 1))
        heads, extra, aux = self.method.init(k_head, cfg, clip_cfg)
        params = {"clip": clip_params, **heads}

        if "train_labels" in aux:  # MITH's buffer losses need the full split
            aux["train_labels"] = jnp.asarray(self.train_data.all_labels())

        steps_per_epoch = len(self.train_loader)
        self.tx = make_main_optimizer(cfg, params, steps_per_epoch)
        if self.method.grad_clip > 0:
            # global clip before BertAdam's per-tensor clip
            # (train/DPSIH/hash_train.py:70-71)
            import optax as _optax

            self.tx = _optax.chain(
                _optax.clip_by_global_norm(self.method.grad_clip), self.tx)
        self.extra_tx = self.method.extra_tx(cfg) if self.method.extra_tx else None
        self.state = init_state(k_state, params, extra, aux, self.tx, self.extra_tx)

        if cfg.pretrained:
            if not os.path.exists(cfg.pretrained):
                # a typo'd path must not silently fall through to random
                # weights (--test would then report garbage mAPs)
                raise FileNotFoundError(
                    f"--pretrained {cfg.pretrained!r} does not exist")
            self.load_checkpoint(cfg.pretrained)

        # tensor parallelism: mesh_shape=(dp, tp) — relayout the live qkv
        # weights to the head-major TP order BEFORE the loss/encode fns
        # capture clip_cfg; checkpoints stay canonical (parallel/tp.py)
        self.tp = tp = cfg.mesh_shape[1] if len(cfg.mesh_shape) > 1 else 1
        if tp > 1:
            import dataclasses

            from ccmh.parallel import tp as tp_mod

            tp_mod.validate(self.clip_cfg, tp)
            clip_cfg = self.clip_cfg = dataclasses.replace(
                self.clip_cfg, qkv_layout="head_major")
            self.state = tp_mod.relayout_state(self.state, clip_cfg,
                                               to_head_major=True)

        loss_fn = self.method.make_loss_fn(cfg, clip_cfg)
        custom = (self.method.custom_step(cfg, clip_cfg, self.tx, self.extra_tx)
                  if self.method.custom_step else None)
        self.mesh = None
        self.fsdp = bool(getattr(cfg, "fsdp", False)) and (
            tp > 1 or (cfg.mesh_shape and cfg.mesh_shape[0] > 1))
        if tp > 1:
            from ccmh.parallel import tp as tp_mod

            self.mesh = tp_mod.make_mesh_2d(cfg.mesh_shape[0], tp)
            raw_step = make_train_step(loss_fn, self.tx, self.extra_tx, cfg,
                                       clip_cfg, jit=False, custom_step=custom)
            if self.fsdp:
                from ccmh.parallel import fsdp as fsdp_mod

                self.train_step, self.state = fsdp_mod.fsdp_train_step(
                    raw_step, self.mesh, self.state)
            else:
                self.train_step, self.state = tp_mod.tensor_parallel_train_step(
                    raw_step, self.mesh, self.state)
            self.logger.info(
                f"2-D mesh: data={cfg.mesh_shape[0]} x model={tp} "
                f"(Megatron-sharded towers"
                + (", FSDP weight/moment sharding)" if self.fsdp else ")"))
        elif cfg.mesh_shape and cfg.mesh_shape[0] > 1:
            from ccmh.parallel.mesh import make_mesh, data_parallel_train_step, replicate

            self.mesh = make_mesh(cfg.mesh_shape[0])
            raw_step = make_train_step(loss_fn, self.tx, self.extra_tx, cfg,
                                       clip_cfg, jit=False, custom_step=custom)
            if self.fsdp:
                from ccmh.parallel import fsdp as fsdp_mod

                self.train_step, self.state = fsdp_mod.fsdp_train_step(
                    raw_step, self.mesh, self.state)
            else:
                self.train_step = data_parallel_train_step(raw_step, self.mesh)
                self.state = replicate(self.mesh, self.state)
                self._raw_step = raw_step   # resident stepper wraps the raw
            self.logger.info(
                f"data-parallel mesh over {cfg.mesh_shape[0]} devices"
                + (" (FSDP weight/moment sharding)" if self.fsdp else ""))
        else:
            self.train_step = make_train_step(loss_fn, self.tx, self.extra_tx,
                                              cfg, clip_cfg, custom_step=custom)
        # pin the decided-in-_init_data resident split now that the mesh
        # exists: row-sharded over the DP axis, or whole on one device
        if self._resident_source is not None:
            from ccmh.data.resident import ResidentImages

            sharding = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sharding = NamedSharding(self.mesh, P("data"))
            self.train_resident = ResidentImages(
                self._resident_source.images, sharding=sharding)
            self.logger.info(
                f"device-resident images: pinned {self.train_resident.n} "
                f"items ({self.train_resident.nbytes / 2**20:.0f} MiB"
                + (f", row-sharded over {self.mesh.devices.size} devices"
                   if self.mesh is not None else "") + ")")
        self.train_chunked = None
        if self._chunked_source is not None:
            self._init_chunked_residency()
        if self.mesh is not None:
            # replicate the (tiny) code outputs: the host-side scatter in
            # get_code needs fully-addressable arrays — on a single host
            # this is a cheap gather; on a multi-controller mesh it is
            # what makes np.asarray(codes) legal in every process
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            self.encode_step = jax.jit(
                lambda p, a, b: self.method.encode(p, a, b, cfg, clip_cfg),
                out_shardings=repl)
        else:
            self.encode_step = self.method.make_encode_fn(cfg, clip_cfg)
        self.eval_dist_fn = self.method.dist_fn(cfg) if self.method.dist_fn else None
        self.multi_encode_step = None
        if self.method.multi_encode is not None:
            import jax as _jax

            kw = {}
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                kw["out_shardings"] = NamedSharding(self.mesh, P())
            self.multi_encode_step = _jax.jit(
                lambda p, a, b: self.method.multi_encode(p, a, b, cfg, clip_cfg),
                **kw)
            self.max_multi: dict = {}
        self._plan_eval_residency()

    def _init_chunked_residency(self):
        """HYBRID residency for an over-budget train split (VERDICT r4 #2).

        The budget covers a pinned REGION of the split (rows < R, never
        re-transferred) plus two superblock pixel buffers of M rows each
        (current + the double-buffered next).  Each epoch streams only the
        non-resident rows, one buffer put per superblock overlapped with
        that block's steps — per-epoch transfer degrades LINEARLY in the
        over-budget fraction instead of cliff-dropping to the per-step
        streaming rate.  Bit-exact: batch composition/order are untouched;
        rows are merely sourced from region vs buffer (data/resident.py
        augment_chunked_batches / make_chunked_epoch_step).
        """
        import numpy as _np

        from ccmh.data.resident import ResidentImages

        cfg = self.cfg
        cache = self._chunked_source
        row_bytes = int(_np.prod(cache.images.shape[1:]))
        n = len(cache.images)
        ndev = self.mesh.devices.size if self.mesh is not None else 1
        budget = getattr(cfg, "device_resident_budget_mb", 6144) * 2**20
        m = int(getattr(cfg, "device_resident_block_rows", 0)) or max(
            cfg.batch_size, 512)
        m = min(m, n)
        if budget <= 2 * m * row_bytes:   # buffers alone would blow it
            m = max(cfg.batch_size, 1)
        r = int(min(n, max(1, ndev * (budget - 2 * m * row_bytes)
                           // row_bytes)))
        # a barely-over-budget split streams only a few rows per epoch —
        # don't ship a mostly-padding buffer for them: cap the block at the
        # streamed remainder (>= one batch) and re-grow the region with the
        # budget the smaller buffers freed
        m2 = max(cfg.batch_size, min(m, n - r))
        if m2 < m:
            m = m2
            r = int(min(n, max(1, ndev * (budget - 2 * m * row_bytes)
                               // row_bytes)))
        sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P("data"))
        region = ResidentImages(cache.images[:r], sharding=sharding)
        self.train_chunked = {"region": region, "R": r, "M": m,
                              "cache": cache, "row_shape": cache.images.shape[1:]}
        self.logger.info(
            f"device-resident images [chunked]: pinned rows 0..{r} of {n} "
            f"({region.nbytes / 2**20:.0f} MiB"
            + (f", row-sharded over {ndev} devices" if ndev > 1 else "")
            + f"); the remaining {n - r} rows stream once per epoch in "
            f"{m}-row double-buffered superblocks "
            f"({m * row_bytes / 2**20:.0f} MiB each)")

    def _plan_eval_residency(self):
        """Decide which EVAL splits pin to HBM (zero-put validation).

        The streaming ``get_code`` re-transfers every query+retrieval pixel
        batch each valid epoch — the put-bound disease device-resident
        epochs cured for training.  Eval inputs are epoch-invariant, so a
        split that fits the remaining per-chip budget (after the train
        residency) pins ONCE and every later validation is a single device
        dispatch per split (data/resident.py ResidentEvalSplit).  Query is
        planned first (smaller, always re-encoded); splits over budget keep
        streaming (COCO's 17 GiB retrieval split on a 16 GiB chip).  Pins
        happen lazily at the first get_code — a valid=False training run
        never pays them.  tp/fsdp transports stream (same gating as the
        resident train stepper).
        """
        cfg = self.cfg
        self._resident_eval: Dict[str, object] = {}        # split -> encoders
        self._resident_eval_plan: Dict[str, object] = {}   # split -> cache
        mode = getattr(cfg, "device_resident_images", "auto")
        tp = getattr(self, "tp", 1)
        if (mode == "off" or tp > 1 or getattr(self, "fsdp", False)
                or jax.process_count() > 1):
            return
        from ccmh.data.resident import ResidentEvalSplit

        budget = getattr(cfg, "device_resident_budget_mb", 6144) * 2**20
        ndev = self.mesh.devices.size if self.mesh is not None else 1
        used = self.train_resident.nbytes if self.train_resident is not None else 0
        if getattr(self, "train_chunked", None) is not None:
            # chunked training consumes (by construction) essentially the
            # whole budget: region + 2 replicated superblock buffers
            ck = self.train_chunked
            import numpy as _np

            row = int(_np.prod(ck["row_shape"]))
            used += ck["region"].nbytes + 2 * ck["M"] * row * ndev
        for split, ds in (("query", self.query_data),
                          ("retrieval", self.retrieval_data)):
            cache = self._split_caches.get(split)
            if cache is None:
                continue
            est = ResidentEvalSplit.plan_bytes(cache, ds, cfg.eval_batch)
            if (used + est) / ndev <= budget:
                self._resident_eval_plan[split] = cache
                used += est
            else:
                self.logger.info(
                    f"device-resident eval: {split} streams "
                    f"({(used + est) / ndev / 2**20:.0f} MiB/chip would "
                    f"exceed the {budget / 2**20:.0f} MiB budget)")

    def _resident_eval_encoders(self, loader: BatchIterator):
        """(encode, multi_encode) one-dispatch encoders for ``loader``'s
        split, pinning the split on first use; (None, None) if it streams."""
        split, ds = None, None
        if loader is getattr(self, "query_loader", None):
            split, ds = "query", self.query_data
        elif loader is getattr(self, "retrieval_loader", None):
            split, ds = "retrieval", self.retrieval_data
        if split is None or split not in self._resident_eval_plan:
            return None, None
        enc = self._resident_eval.get(split)
        if enc is None:
            from ccmh.data.resident import (
                ResidentEvalSplit, make_resident_eval_encoder,
            )

            sharding = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sharding = NamedSharding(self.mesh, P("data"))
            res = ResidentEvalSplit(
                self._resident_eval_plan[split], ds, self.cfg.eval_batch,
                sharding=sharding)
            cfg, clip_cfg, method = self.cfg, self.clip_cfg, self.method
            encode = make_resident_eval_encoder(
                lambda p, a, b: method.encode(p, a, b, cfg, clip_cfg),
                res, needs_mask=method.needs_mask, mesh=self.mesh)
            multi = None
            if method.multi_encode is not None:
                multi = make_resident_eval_encoder(
                    lambda p, a, b: method.multi_encode(p, a, b, cfg, clip_cfg),
                    res, needs_mask=method.needs_mask, mesh=self.mesh)
            enc = self._resident_eval[split] = (encode, multi)
            self.logger.info(
                f"device-resident eval: pinned {split} split ({res.n} items, "
                f"{res.nbytes / 2**20:.0f} MiB"
                + (f", row-sharded over {self.mesh.devices.size} devices"
                   if self.mesh is not None else "")
                + ") — zero host transfers per validation")
        return enc

    # ------------------------------------------------------------------ train
    def run(self):
        if self.cfg.is_train:
            self.train()
        else:
            self.test()

    def request_preempt(self) -> None:
        """Ask the training loop to checkpoint at the next step boundary and
        exit cleanly.  Wired to SIGTERM while ``train()`` runs (the signal a
        preempted TPU VM / batch scheduler sends); also callable directly."""
        self._preempt = True

    def train(self):
        import signal
        import threading

        self.logger.info("Start train.")
        start_epoch, skip_steps = 0, 0
        if self.cfg.resume:
            start_epoch, skip_steps = self.try_resume()
        self._preempt = False
        # graceful preemption: SIGTERM -> full-state checkpoint at the next
        # step boundary -> clean exit; --resume continues BIT-EXACTLY from
        # that step (the loader order and caption draws are pure functions
        # of (seed, epoch, item), so the replayed remainder is identical).
        # The reference loses the epoch in progress AND all optimizer state.
        old_handler = None
        in_main = threading.current_thread() is threading.main_thread()
        if in_main:
            def _on_sigterm(signum, frame):
                self.logger.info(
                    "SIGTERM: checkpointing at the next step boundary")
                self.request_preempt()

            old_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        try:
            for epoch in range(start_epoch, self.cfg.epochs):
                if not self.train_epoch(epoch, skip_steps=skip_steps):
                    return  # preempted: checkpoint already written
                skip_steps = 0
                if self._preempt:  # signal landed on the epoch's last step
                    self.save_full_checkpoint(epoch)
                    self.logger.info(
                        f"preempted after epoch {epoch}; rerun with --resume")
                    return
                if self.cfg.valid:
                    self.valid(epoch)
                if self.cfg.save_model:
                    self.save_checkpoint(os.path.join(self.cfg.save_dir, f"model-{epoch}.npz"))
                if self.cfg.checkpoint_every and (epoch + 1) % self.cfg.checkpoint_every == 0:
                    self.save_full_checkpoint(epoch)
        finally:
            if self._async_saver is not None:
                # finalize any in-flight checkpoint write before returning —
                # covers normal completion, preemption AND exceptions, so the
                # newest slot on disk is always complete when train() exits
                self._async_saver.close()
                self._async_saver = None
            if in_main:
                signal.signal(signal.SIGTERM, old_handler)
        self.logger.info(
            f">>>>>>> FINISHED >>>>>> Best epoch, I-T: {self.best_epoch_i}, "
            f"mAP: {self.max_mapi2t}, T-I: {self.best_epoch_t}, mAP: {self.max_mapt2i}")

    def train_epoch(self, epoch: int, skip_steps: int = 0) -> bool:
        """One epoch (optionally resuming mid-epoch at batch ``skip_steps``).
        Returns False when preempted — a full-state checkpoint tagged with
        the step survived to disk and ``train()`` exits cleanly."""
        cfg = self.cfg
        self.logger.info(f">>>>>> epochs: {epoch}/{cfg.epochs}")
        self.train_loader.set_epoch(epoch)  # resume-safe shuffle order
        if skip_steps:
            # O(1): the first skip_steps batches are never assembled
            self.train_loader.set_start_step(skip_steps)
            self.logger.info(
                f"mid-epoch resume: fast-forwarding {skip_steps} steps")
        step_in_epoch = skip_steps
        if cfg.profile and epoch == 1:  # skip the compile-heavy first epoch
            jax.profiler.start_trace(os.path.join(cfg.save_dir, "profile"))
        losses = []
        start = time.time()
        epoch_scalar = jnp.asarray(epoch, jnp.int32)
        if self.train_resident is not None or self.train_chunked is not None:
            pass   # resident epochs need no per-batch put at all (below)
        elif self.mesh is not None:
            from ccmh.parallel.mesh import shard_batch

            def put(b):
                b = shard_batch(self.mesh, b)
                # scalars replicate (shard_batch shards leading axes only)
                b["epoch"] = epoch_scalar
                return b
        else:
            def put(b):
                b = {k: jax.device_put(v) for k, v in b.items()}
                b["epoch"] = epoch_scalar
                return b

        # double-buffered puts: the transfer of batch N+1 is enqueued while
        # step N computes, so the epoch runs at ~max(put, step) instead of
        # put + step serialized (data/prefetch.py)
        from ccmh.data.prefetch import device_prefetch

        if self.train_resident is not None:
            # device-resident epochs (data/resident.py): pixels are already
            # in HBM (row-sharded over a DP mesh); the whole epoch's fused
            # host fields pin in ONE put and each step is a single dispatch
            # that slices its row with a device-carried counter — ZERO
            # host->device transfers per step, so epoch rate is immune to
            # put latency (the relay host's swings 50 ms - >1 s)
            from ccmh.data.resident import make_resident_epoch_step, pack_epoch

            if not hasattr(self, "_resident_epoch_stepper"):
                self._resident_epoch_stepper = make_resident_epoch_step(
                    self._raw_step if self.mesh is not None
                    else self.train_step, mesh=self.mesh)
            repl = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                repl = NamedSharding(self.mesh, P())

            def resident_stream():
                # host-assemble the (image-free) epoch: meta + tokenize at
                # host-stream rates far above the step rate.  Every table is
                # zero-padded to the FULL epoch's row count: the compiled
                # program is keyed by (spec, table.shape), so a mid-epoch
                # resume (whose truncated loader would otherwise produce a
                # novel shape and a multi-minute cold recompile through the
                # relay) reuses the warm executable — rows past n_rows are
                # never sliced (the counter stops there).
                n_target = len(self.train_loader)
                for table_np, spec, n_rows in pack_epoch(
                        list(self.train_loader)):
                    pad = n_target - table_np.shape[0]
                    if pad > 0:
                        table_np = np.concatenate([
                            table_np,
                            np.zeros((pad, table_np.shape[1]), np.uint8)])
                    table = (jax.device_put(table_np, repl)
                             if repl is not None
                             else jax.device_put(table_np))
                    counter = jnp.zeros((), jnp.int32)
                    if repl is not None:
                        counter = jax.device_put(counter, repl)
                    holder = [counter]
                    for _ in range(n_rows):
                        yield (table, spec, holder)

            stream = resident_stream()

            def run_step(state, item):
                table, spec, holder = item
                state, metrics, holder[0] = self._resident_epoch_stepper(
                    state, table, spec, holder[0], epoch_scalar,
                    self.train_resident.images)
                return state, metrics
        elif self.train_chunked is not None:
            # HYBRID residency (data/resident.py chunked mode): the pinned
            # region never re-transfers; only the over-budget remainder
            # streams, one superblock pixel-buffer put per many steps,
            # double-buffered behind the previous block's compute.  Meta
            # rides the one-put epoch table exactly like full residency.
            from ccmh.data.resident import (
                AsyncBlockPut, augment_chunked_batches,
                make_chunked_epoch_step, pack_epoch,
            )

            if not hasattr(self, "_chunked_epoch_stepper"):
                self._chunked_epoch_stepper = make_chunked_epoch_step(
                    self._raw_step if self.mesh is not None
                    else self.train_step, mesh=self.mesh)
            repl = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                repl = NamedSharding(self.mesh, P())
            ck = self.train_chunked

            def chunked_stream():
                cache, r_rows, m_rows = ck["cache"], ck["R"], ck["M"]
                n_target = len(self.train_loader)
                aug, sblocks, sb_of_batch = augment_chunked_batches(
                    list(self.train_loader), r_rows, m_rows)
                putter = AsyncBlockPut(sharding=repl)
                row_shape = ck["row_shape"]

                def start_block(g):
                    idx = sblocks[g]
                    buf = np.zeros((m_rows,) + tuple(row_shape), np.uint8)
                    if len(idx):
                        buf[: len(idx)] = cache.gather(idx)
                    putter.start(g, buf)

                start_block(0)
                step = 0
                current = {"g": None, "buf": None}
                for table_np, spec, n_rows in pack_epoch(aug):
                    pad = n_target - table_np.shape[0]
                    if pad > 0:   # resumed epochs reuse the warm shape
                        table_np = np.concatenate([
                            table_np,
                            np.zeros((pad, table_np.shape[1]), np.uint8)])
                    table = (jax.device_put(table_np, repl)
                             if repl is not None
                             else jax.device_put(table_np))
                    counter = jnp.zeros((), jnp.int32)
                    if repl is not None:
                        counter = jax.device_put(counter, repl)
                    holder = [counter]
                    for _ in range(n_rows):
                        g = sb_of_batch[step]
                        if current["g"] != g:
                            current["buf"] = putter.get(g)
                            current["g"] = g
                            if g + 1 < len(sblocks):
                                start_block(g + 1)   # overlap next block
                        yield (table, spec, holder, current["buf"])
                        step += 1

            stream = chunked_stream()

            def run_step(state, item):
                table, spec, holder, sb_buf = item
                state, metrics, holder[0] = self._chunked_epoch_stepper(
                    state, table, spec, holder[0], epoch_scalar,
                    ck["region"].images, sb_buf)
                return state, metrics
        else:
            stream = device_prefetch(
                self.train_loader, put,
                depth=getattr(cfg, "prefetch_device", 2))
            run_step = self.train_step

        for batch in stream:
            self.state, metrics = run_step(self.state, batch)
            self.global_step += 1
            step_in_epoch += 1
            losses.append(metrics["loss"])
            if self.global_step % cfg.display_step == 0:
                m = {k: float(v) for k, v in metrics.items()}
                self.logger.info(f">>>>>> Display >>>>>> [{epoch}/{cfg.epochs}] {m}")
                self.metrics.write("train", self.global_step, **m)
            if getattr(self, "_preempt", False) and step_in_epoch < len(self.train_loader):
                self.total_time += time.time() - start
                if cfg.profile and epoch == 1:
                    jax.profiler.stop_trace()
                self.save_full_checkpoint(epoch, step_in_epoch=step_in_epoch)
                self.logger.info(
                    f"preempted at epoch {epoch} step {step_in_epoch}/"
                    f"{len(self.train_loader)}; rerun with --resume to "
                    f"continue bit-exactly from this step")
                return False
        self.total_time += time.time() - start
        if cfg.profile and epoch == 1:
            jax.profiler.stop_trace()
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        self.logger.info(
            f">>>>>> [{epoch}/{cfg.epochs}] loss: {mean_loss}, time: {self.total_time}")
        return True

    # ------------------------------------------------------------------- eval
    def get_code(self, loader: BatchIterator, length: int) -> Tuple[np.ndarray, np.ndarray, float]:
        """Extract ±1 codes for a split, scattered by dataset index
        (parity: train/base.py:130-148; encoder_time accumulates — the
        reference's `=` overwrite at base.py:144 is a recorded bug).

        With a mesh, each batch is sharded over the data axis so encoding
        uses every chip (params are replicated; GSPMD shards the towers).

        When the split is device-resident (zero-put validation,
        data/resident.py), the whole extraction is ONE jitted dispatch over
        the pinned pixel+token tables and the codes are returned as DEVICE
        arrays (they feed the on-device mAP directly; np.asarray converts
        on the rare best-epoch snapshot paths)."""
        encode, _ = self._resident_eval_encoders(loader)
        if encode is not None:
            import jax as _jax

            start = time.time()
            img_codes, txt_codes = encode(self.state.params, self.state.aux)
            _jax.block_until_ready(txt_codes)
            return img_codes, txt_codes, time.time() - start
        img_buf = txt_buf = None  # width inferred from the first batch
        encoder_time = 0.0
        from ccmh.data.prefetch import device_prefetch

        for jbatch, batch in device_prefetch(
                loader, self._put_eval,
                depth=getattr(self.cfg, "prefetch_device", 2)):
            start = time.time()
            img_codes, txt_codes = self.encode_step(self.state.params, self.state.aux, jbatch)
            img_codes, txt_codes = np.asarray(img_codes), np.asarray(txt_codes)
            encoder_time += time.time() - start
            if img_buf is None:
                img_buf = np.zeros((length, img_codes.shape[1]), np.int8)
                txt_buf = np.zeros((length, txt_codes.shape[1]), np.int8)
            valid = batch["valid"]
            idx = batch["index"][valid]
            img_buf[idx] = img_codes[valid]
            txt_buf[idx] = txt_codes[valid]
        return img_buf, txt_buf, encoder_time

    def _put_eval(self, batch):
        """(device batch, host batch) — the host dict keeps the index/valid
        arrays the scatter needs after encoding.  'valid' ALSO travels to
        the device: wrap-padded final batches must not pollute
        batch-statistics encodes (TwDH's BN, train/methods/twdh.py)."""
        if self.mesh is not None:
            from ccmh.parallel.mesh import shard_batch

            jbatch = shard_batch(self.mesh, dict(batch))
        else:
            jbatch = {key: jax.device_put(v) for key, v in batch.items()}
        return jbatch, batch

    # hist-vs-exact mAP agreement bound: a hist candidate within this margin
    # of the running max triggers an exact recompute before any best-epoch
    # decision.  tests/test_ops.py bounds the estimator gap well inside
    # this on realistic tie structures (all-equal codes, tiny K, trainer-
    # scale random); on ADVERSARIAL data whose relevance correlates with
    # gallery index the absolute gap can exceed any fixed margin
    # (test_two_bucket_adversarial measures ~0.12), which is why
    # _needs_exact below ALSO triggers on hist-vs-hist candidates: the
    # estimator's bias is a property of the (labels, index-order)
    # structure and is stable across epochs, so comparing hist to the
    # running hist max recovers the right candidates even when the
    # absolute bias is large.
    EXACT_MARGIN = 0.02

    @staticmethod
    def _needs_exact(hist_val: float, max_exact: float, max_hist: float,
                     margin: float = EXACT_MARGIN,
                     hist_bias: Optional[float] = None) -> bool:
        """Should this epoch's hist estimate be re-checked exactly?

        Dual trigger: (a) within ``margin`` of the running EXACT max —
        estimator noise must not flip a best-epoch decision; (b) within
        ``margin`` of the running HIST max — robust to a large constant
        estimator bias (index-correlated ties), where (a) alone would
        never fire because every hist value sits far below the exact max.

        ``hist_bias`` is the largest |exact - hist| divergence OBSERVED so
        far on this run's data: trigger (b) only engages once it exceeds
        the margin (the bias is a dataset property, stable across epochs,
        and is measured for free every time trigger (a) fires — which it
        always does on the first epochs while the exact max is still
        small).  Without the gate a plateaued run re-ran the exact sort
        almost every epoch, eroding the <1 s hist fast-path (ADVICE r4).
        ``None`` (bias unobserved/legacy callers) keeps (b) always-on.
        """
        if hist_val > max_exact - margin:
            return True
        if hist_bias is not None and hist_bias <= margin:
            return False  # estimator verified accurate here; (a) suffices
        return hist_val > max_hist - margin

    def _eval_labels_dev(self):
        """(query, retrieval) label matrices as cached DEVICE arrays: the
        labels never change across epochs, so putting them once makes every
        later on-device mAP call transfer-free (calc_map keeps device
        inputs on device)."""
        if not hasattr(self, "_labels_dev"):
            self._labels_dev = (
                jnp.asarray(self.query_labels, jnp.float32),
                jnp.asarray(self.retrieval_labels, jnp.float32))
        return self._labels_dev

    def valid(self, epoch: int):
        self.logger.info("Valid.")
        q_img, q_txt, q_time = self.get_code(self.query_loader, len(self.query_data))
        r_img, r_txt, r_time = self.get_code(self.retrieval_loader, len(self.retrieval_data))
        qL, rL = self._eval_labels_dev()

        # fast sweep with the sort-free expected-tie estimator; ranking is
        # sharded over the mesh when one is configured
        kw = dict(dist_fn=self.eval_dist_fn, n_bins=self.cfg.output_dim + 1,
                  mesh=self.mesh,
                  shard_gallery=(self.cfg.shard_gallery
                                 if self.mesh is not None else None))
        i2t, t2i, i2i, t2t = map(float, calc_map_4way(
            q_img, q_txt, r_img, r_txt, qL, rL,
            **kw))

        # best-epoch decisions (and the values they record) use the EXACT
        # stable-sort metric: 0.02 of estimator noise must not flip which
        # epoch's codes get snapshotted (utils/calc_utils.py:31 semantics)
        from ccmh.ops.map_metric import calc_map

        # exact ranking always replicates the gallery (its full-row sort
        # cannot run gallery-sharded), whatever cfg.shard_gallery says
        kw_exact = {**kw, "shard_gallery": False}
        if not hasattr(self, "_max_hist_i2t"):
            self._max_hist_i2t = self._max_hist_t2i = 0.0
            self._hist_bias = 0.0   # max observed |exact - hist| divergence
        hist_i2t, hist_t2i = i2t, t2i
        if self._needs_exact(i2t, self.max_mapi2t, self._max_hist_i2t,
                             hist_bias=self._hist_bias):
            i2t = float(calc_map(q_img, r_txt, qL, rL, method="exact",
                                 **kw_exact))
            self._hist_bias = max(self._hist_bias, abs(i2t - hist_i2t))
        if self._needs_exact(t2i, self.max_mapt2i, self._max_hist_t2i,
                             hist_bias=self._hist_bias):
            t2i = float(calc_map(q_txt, r_img, qL, rL, method="exact",
                                 **kw_exact))
            self._hist_bias = max(self._hist_bias, abs(t2i - hist_t2i))
        self._max_hist_i2t = max(self._max_hist_i2t, hist_i2t)
        self._max_hist_t2i = max(self._max_hist_t2i, hist_t2i)

        if self.max_mapi2t < i2t:
            self.best_epoch_i = epoch
            if self.cfg.save_mat:
                self.save_mat(q_img, q_txt, r_img, r_txt, mode_name="i2t")
        self.max_mapi2t = max(self.max_mapi2t, i2t)
        if self.max_mapt2i < t2i:
            self.best_epoch_t = epoch
            if self.cfg.save_mat:
                self.save_mat(q_img, q_txt, r_img, r_txt, mode_name="t2i")
        self.max_mapt2i = max(self.max_mapt2i, t2i)

        self.logger.info(
            f">>>>>> [{epoch}/{self.cfg.epochs}], MAP(i->t): {i2t}, MAP(t->i): {t2i}, "
            f"MAP(t->t): {t2t}, MAP(i->i): {i2i}, MAX MAP(i->t): {self.max_mapi2t}, "
            f"MAX MAP(t->i): {self.max_mapt2i}, query_encoder_time: {q_time}, "
            f"retrieval_encoder_time: {r_time}")
        self.metrics.write("valid", self.global_step, epoch=epoch, i2t=i2t,
                           t2i=t2i, i2i=i2i, t2t=t2t,
                           q_encoder_time=q_time, r_encoder_time=r_time)
        if self.cfg.save_csv and self.is_lead:
            # the reference declares --save_csv but never writes anything
            # (argsbase.py:11, SURVEY §5); here it produces the per-epoch
            # mAP table the flag promises.
            csv_path = os.path.join(self.cfg.save_dir, "results.csv")
            write_header = not os.path.exists(csv_path)
            with open(csv_path, "a") as fh:
                if write_header:
                    fh.write("epoch,i2t,t2i,i2i,t2t,max_i2t,max_t2i\n")
                fh.write(f"{epoch},{i2t},{t2i},{i2i},{t2t},"
                         f"{self.max_mapi2t},{self.max_mapt2i}\n")
        if self.multi_encode_step is not None:
            self.valid_multi(epoch)
        return i2t, t2i, i2i, t2t

    def _get_multi_codes(self, loader: BatchIterator, length: int):
        _, multi = self._resident_eval_encoders(loader)
        if multi is not None:
            out = multi(self.state.params, self.state.aux)
            return {name: [ic, tc] for name, (ic, tc) in out.items()}
        buffers: Dict[str, list] = {}
        from ccmh.data.prefetch import device_prefetch

        for jbatch, batch in device_prefetch(
                loader, self._put_eval,
                depth=getattr(self.cfg, "prefetch_device", 2)):
            out = self.multi_encode_step(self.state.params, self.state.aux, jbatch)
            valid = batch["valid"]
            idx = batch["index"][valid]
            for name, (ic, tc) in out.items():
                if name not in buffers:
                    k = np.asarray(ic).shape[1]
                    buffers[name] = [np.zeros((length, k), np.int8),
                                     np.zeros((length, k), np.int8)]
                buffers[name][0][idx] = np.asarray(ic)[valid]
                buffers[name][1][idx] = np.asarray(tc)[valid]
        return buffers

    def valid_multi(self, epoch: int):
        """Per-length validation for multi-code methods
        (train/TwDH/hash_train.py:219-253 valid_each)."""
        q = self._get_multi_codes(self.query_loader, len(self.query_data))
        r = self._get_multi_codes(self.retrieval_loader, len(self.retrieval_data))
        qL, rL = self._eval_labels_dev()
        for name in q:
            i2t, t2i, i2i, t2t = map(float, calc_map_4way(
                q[name][0], q[name][1], r[name][0], r[name][1],
                qL, rL, mesh=self.mesh,
                shard_gallery=(self.cfg.shard_gallery
                               if self.mesh is not None else None)))
            best = self.max_multi.setdefault(name, {"i2t": 0.0, "t2i": 0.0})
            best["i2t"] = max(best["i2t"], i2t)
            best["t2i"] = max(best["t2i"], t2i)
            self.logger.info(
                f">>>>>> [{epoch}/{self.cfg.epochs}] [{name}] MAP(i->t): {i2t}, "
                f"MAP(t->i): {t2i}, MAP(i->i): {i2i}, MAP(t->t): {t2t}, "
                f"MAX i2t: {best['i2t']}, MAX t2i: {best['t2i']}")
            self.metrics.write(f"valid_{name}", self.global_step, epoch=epoch,
                               i2t=i2t, t2i=t2i, i2i=i2i, t2t=t2t)

    def test(self, mode_name: str = "i2t"):
        if not self.cfg.pretrained:
            raise RuntimeError("test requires --pretrained (train/base.py:278)")
        q_img, q_txt, _ = self.get_code(self.query_loader, len(self.query_data))
        r_img, r_txt, _ = self.get_code(self.retrieval_loader, len(self.retrieval_data))
        qL, rL = self._eval_labels_dev()
        # final reported numbers are the exact stable-sort metric
        i2t, t2i, i2i, t2t = map(float, calc_map_4way(
            q_img, q_txt, r_img, r_txt, qL, rL,
            method="exact", dist_fn=self.eval_dist_fn,
            n_bins=self.cfg.output_dim + 1, mesh=self.mesh))
        self.logger.info(
            f">>>>>> MAP(i->t): {i2t}, MAP(t->i): {t2i}, MAP(t->t): {t2t}, MAP(i->i): {i2i}")
        self.save_mat(q_img, q_txt, r_img, r_txt, mode_name=mode_name)
        self.save_pr_curves(q_img, q_txt, r_img, r_txt)
        return i2t, t2i, i2i, t2t

    def save_pr_curves(self, q_img, q_txt, r_img, r_txt):
        """PR + topN-precision curves for both directions, computed on
        device (ops/pr_curve.py) and written next to the code dumps.  The
        reference stops at dumping the raw codes for external plotting;
        this writes the plottable curves themselves."""
        if not self.is_lead:
            return
        from ccmh.ops.pr_curve import compute_hists, pr_curve, precision_at_n

        save_dir = os.path.join(self.cfg.save_dir, "PR_cruve")
        os.makedirs(save_dir, exist_ok=True)
        n = len(self.retrieval_labels)
        ns = sorted({int(x) for x in np.logspace(0, np.log10(n), 12)})
        kw = dict(dist_fn=self.eval_dist_fn,
                  max_dist=self.cfg.output_dim) if self.eval_dist_fn else {}
        for name, (qB, rB) in (("i2t", (q_img, r_txt)), ("t2i", (q_txt, r_img))):
            # one Q x N distance pass feeds BOTH curves
            hists = compute_hists(qB, rB, self.query_labels,
                                  self.retrieval_labels, **kw)
            precision, recall = pr_curve(
                qB, rB, self.query_labels, self.retrieval_labels,
                hists=hists, **kw)
            p_at_n = precision_at_n(
                qB, rB, self.query_labels, self.retrieval_labels, ns,
                hists=hists, **kw)
            scio.savemat(
                os.path.join(save_dir, f"curves-{name}.mat"),
                {"radius": np.arange(len(precision)), "precision": precision,
                 "recall": recall, "topn": np.asarray(ns), "p_at_n": p_at_n})
        self.logger.info(f">>>>>> save PR/topN curves to {save_dir}")

    def save_mat(self, q_img, q_txt, r_img, r_txt, mode_name="i2t"):
        """.mat export interoperable with reference tooling (train/base.py:328-349)."""
        if not self.is_lead:
            return   # identical codes in every process; process 0 writes
        save_dir = os.path.join(self.cfg.save_dir, "PR_cruve")
        os.makedirs(save_dir, exist_ok=True)
        scio.savemat(
            os.path.join(save_dir,
                         f"{self.cfg.output_dim}-ours-{self.cfg.dataset}-{mode_name}.mat"),
            {
                "q_img": np.asarray(q_img, np.float64),
                "q_txt": np.asarray(q_txt, np.float64),
                "r_img": np.asarray(r_img, np.float64),
                "r_txt": np.asarray(r_txt, np.float64),
                "q_l": self.query_labels,
                "r_l": self.retrieval_labels,
            },
        )
        self.logger.info(f">>>>>> save best {mode_name} data!")

    # ------------------------------------------------------------- checkpoint
    def save_full_checkpoint(self, epoch: int, step_in_epoch: int = 0):
        """Orbax checkpoint of the COMPLETE TrainState + epoch + best-mAP
        trackers — the failure-recovery path the reference lacks (SURVEY §5:
        its only recovery is weight reload via --pretrained,
        train/base.py:225-227; optimizer state and progress are lost).

        ``step_in_epoch`` > 0 marks a mid-epoch PREEMPTION checkpoint:
        ``epoch`` is then the epoch in progress, and resume fast-forwards
        the (deterministically keyed) loader past the completed steps."""
        if not self.is_lead:
            return   # multi-host: state is replicated, process 0 writes
        from ccmh.train.checkpoint import AsyncStateSaver, save_state

        state = self._canonical_state()
        if self.mesh is not None:
            state = jax.tree.map(
                lambda t: np.asarray(t) if hasattr(t, "shape") else t, state)
        root = os.path.join(self.cfg.save_dir, "state_ckpt")
        meta = self._tracker_meta(step_in_epoch)
        if self.cfg.async_checkpoint:
            # overlapped write: save() returns after the arrays are staged to
            # host and the disk write proceeds on orbax's background thread,
            # concurrently with the next epoch.  train() closes (= finalizes)
            # the saver on every exit path, so preemption checkpoints are
            # always complete before the process returns.
            if self._async_saver is None:
                self._async_saver = AsyncStateSaver()
            self._async_saver.save(root, state, epoch, meta=meta)
        else:
            save_state(root, state, epoch, meta=meta)
        at = f" (step {step_in_epoch})" if step_in_epoch else ""
        self.logger.info(f"full-state checkpoint @ epoch {epoch}{at}")

    def _tracker_meta(self, step_in_epoch: int = 0) -> Dict[str, float]:
        return {
            "max_mapi2t": self.max_mapi2t, "max_mapt2i": self.max_mapt2i,
            "best_epoch_i": float(self.best_epoch_i),
            "best_epoch_t": float(self.best_epoch_t),
            "total_time": self.total_time,
            "step_in_epoch": float(step_in_epoch),
        }

    def try_resume(self) -> Tuple[int, int]:
        """Resume from save_dir/state_ckpt if present.  Returns
        ``(start_epoch, skip_steps)``: skip_steps > 0 means the checkpoint
        was a mid-epoch preemption save and ``start_epoch`` is the epoch to
        re-enter at that step."""
        from ccmh.train.checkpoint import latest_checkpoint, load_state

        path = latest_checkpoint(self.cfg.save_dir)
        if path is None:
            return 0, 0
        state, epoch, meta = load_state(path, self.state,
                                        meta_template=self._tracker_meta())
        if meta:
            # restore best-mAP bookkeeping: without it the first post-resume
            # valid() "beats" 0.0 and can overwrite the previously saved
            # best .mat snapshots with worse codes
            self.max_mapi2t = meta.get("max_mapi2t", 0.0)
            self.max_mapt2i = meta.get("max_mapt2i", 0.0)
            self.best_epoch_i = int(meta.get("best_epoch_i", 0))
            self.best_epoch_t = int(meta.get("best_epoch_t", 0))
            self.total_time = meta.get("total_time", 0.0)
        if self.mesh is not None:
            if getattr(self, "tp", 1) > 1:
                # checkpoints are canonical packed-qkv; return to the live
                # head-major layout and the Megatron shardings
                from ccmh.parallel import tp as tp_mod

                state = tp_mod.relayout_state(state, self.clip_cfg,
                                              to_head_major=True)
            if getattr(self, "fsdp", False):
                from ccmh.parallel import fsdp as fsdp_mod

                state = fsdp_mod.shard_state(state, self.mesh)
            elif getattr(self, "tp", 1) > 1:
                from ccmh.parallel import tp as tp_mod

                state = tp_mod.shard_state(state, self.mesh)
            else:
                from ccmh.parallel.mesh import replicate

                state = replicate(self.mesh, state)
        self.state = state
        self.global_step = int(state.step)
        skip = int(meta.get("step_in_epoch", 0.0)) if meta else 0
        if skip:
            self.logger.info(
                f"resumed from {path} (mid-epoch {epoch}, step {skip})")
            return epoch, skip
        self.logger.info(f"resumed from {path} (completed epoch {epoch})")
        return epoch + 1, 0

    def _canonical_state(self) -> TrainState:
        """The live state in the canonical (packed-qkv) layout — the form
        every persistence path stores, whatever mesh the run uses."""
        state = self.state
        if getattr(self, "tp", 1) > 1:
            from ccmh.parallel import tp as tp_mod

            state = tp_mod.relayout_state(state, self.clip_cfg,
                                          to_head_major=False)
        return state

    def save_checkpoint(self, path: str):
        if not self.is_lead:
            return   # multi-host: replicated weights, process 0 writes
        state = self._canonical_state()
        tree = {
            "params": state.params,
            "extra": state.extra if state.extra is not None else {},
            "aux": state.aux,
            "step": state.step,
        }
        save_params_npz(path, jax.tree.map(np.asarray, tree))
        self.logger.info(f"save model to {path}")

    def load_checkpoint(self, path: str):
        self.state = restore_state(path, self.state, self.cfg.method,
                                   self.clip_cfg, log=self.logger.info)


def restore_state(path: str, state, method_name: str, clip_cfg,
                  log=lambda msg: None):
    """Restore weights into ``state`` from any supported checkpoint form:
    a reference trainer ``model-<epoch>.pth`` (train/base.py:225-227, via
    clip/import_ref.py), an orbax ``state_ckpt`` dir, or the .npz
    interchange format.  Shared by Trainer.load_checkpoint and the
    dataset-free serving path (retrieval.Retriever.from_pretrained)."""
    if path.endswith(".pth"):
        # a reference trainer model-<epoch>.pth: import its CLIP tower +
        # heads so reference-trained models can be evaluated/served here
        from ccmh.clip.import_ref import import_reference_pth

        params, ref_cfg, aux_updates = import_reference_pth(path, method_name)
        if ref_cfg != clip_cfg:
            raise ValueError(
                f"checkpoint {path} holds a {ref_cfg} tower but this run "
                f"is configured for {clip_cfg}; point --clip-path at "
                f"the matching architecture")
        aux = state.aux
        if aux_updates:  # e.g. TwDH's BatchNorm running statistics
            aux = dict(aux)
            aux.update(jax.tree.map(jnp.asarray, aux_updates))
        state = state._replace(
            params=jax.tree.map(jnp.asarray, params), aux=aux)
        log(f"imported reference checkpoint {path}")
        return state
    if os.path.isdir(path):
        # an orbax state_ckpt dir: restore the full state's weights (a
        # natural thing to try after --resume runs; the npz branch stays
        # the cross-run interchange format)
        from ccmh.train.checkpoint import load_state

        state, _, _ = load_state(path, state)
        log(f"loaded full-state checkpoint {path}")
        return state
    with np.load(path, allow_pickle=False) as data:
        tree = _unflatten({k: data[k] for k in data.files})
    state = state._replace(
        params=tree["params"],
        extra=tree.get("extra") or state.extra,
        aux=tree.get("aux", state.aux),
        step=jnp.asarray(tree.get("step", 0)),
    )
    log(f"loaded checkpoint {path}")
    return state
