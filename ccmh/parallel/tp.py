"""Tensor parallelism (Megatron-style) for the CLIP towers.

A NEW capability with no reference counterpart (the reference is strictly
single-GPU, SURVEY §2.6): the towers' attention and MLP weights shard over
the ``model`` axis of a 2-D ``("data", "model")`` mesh, so per-chip weight
+ optimizer-moment residency divides by ``tp`` and a single example's
tower FLOPs spread across chips.  ViT-B/32 fits one v5e chip comfortably —
TP exists for the larger zoo towers (ViT-L-class and beyond) and for
latency-bound serving where batch alone cannot fill a slice.

Design (idiomatic GSPMD — annotate weights, let XLA insert collectives):

* **Head-major qkv relayout.**  The canonical fused-qkv packing
  ``[q(all heads) | k | v]`` cannot be head-sharded: the merged output
  axis factors as ``(3, H, Dh)`` with the *interleave* major, so a
  by-head sharding of the reshaped ``[B, L, 3, H, Dh]`` is not
  representable on the flat ``[B, L, 3W]`` matmul output and GSPMD would
  insert an all-to-all every block.  Relayouting columns to
  ``[h0(q k v) | h1(q k v) | ...]`` makes the merged axis factor as
  ``(H, 3, Dh)`` with H major — sharding by head is then representable on
  BOTH sides of the reshape and the qkv matmul output needs no
  communication at all.  ``clip/model.py multi_head_attention`` consumes
  this via ``head_major=True`` (driven by ``ClipConfig.qkv_layout``).
* **Megatron block sharding.**  qkv_w column-sharded (by head), out_w
  row-sharded → ONE all-reduce after the attention output projection;
  mlp fc_w column-sharded, proj_w row-sharded → ONE all-reduce after the
  MLP.  Two all-reduces per block forward — the Megatron minimum.  LN,
  embeddings and projections replicate (they are small and their consumers
  reduce over the full width).
* **Checkpoints stay canonical.**  The relayout is a shape-preserving
  permutation applied to the LIVE state only (params AND the BertAdam
  m/v moments, which must stay elementwise-aligned with params); every
  persistence path (npz / orbax / reference .pth import+export) keeps the
  packed layout, so checkpoints interchange freely with single-chip and
  DP runs.  ``Trainer._canonical_state`` / ``try_resume`` call
  :func:`relayout_state` at the boundary.

Gradients for model-sharded weights inherit the weight sharding; the
batch shards over ``data`` exactly as in the 1-D DP path, and the loss
mean turns into a gradient psum over ``data`` — both inserted by XLA from
the shardings alone.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccmh.clip.model import ClipConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh_2d(dp: int, tp: int) -> Mesh:
    """``(dp, tp)`` device mesh.  Device order follows ``jax.devices()``,
    whose ICI-adjacency-major ordering puts the ``model`` axis (the
    latency-critical per-block all-reduces) on neighbouring chips."""
    devices = jax.devices()
    if len(devices) < dp * tp:
        raise ValueError(
            f"mesh ({dp} data x {tp} model) needs {dp * tp} devices, "
            f"have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp),
                (DATA_AXIS, MODEL_AXIS))


def validate(cfg: ClipConfig, tp: int) -> None:
    """TP requires the ViT tower and head counts divisible by ``tp``
    (per-head sharding cannot split a head)."""
    if cfg.is_resnet:
        raise ValueError(
            "tensor parallelism supports the ViT towers only; the "
            "ModifiedResNet tower has no head-shardable attention stack")
    for tower, heads in (("vision", cfg.vision_heads),
                         ("text", cfg.transformer_heads)):
        if heads % tp:
            raise ValueError(
                f"model-axis size {tp} must divide the {tower} tower's "
                f"{heads} attention heads")


# ---------------------------------------------------------------- relayout

def _permute_qkv(attn: dict, n_head: int, to_head_major: bool) -> dict:
    """Permute stacked fused-qkv columns between the canonical
    ``[q | k | v]`` packing and the head-major ``[h0(q k v) | ...]`` order.
    Shape-preserving; applies equally to params and optimizer moments."""
    w, b = attn["qkv_w"], attn["qkv_b"]
    n_layers, width, three_w = w.shape
    dh = three_w // (3 * n_head)
    if to_head_major:
        w = (w.reshape(n_layers, width, 3, n_head, dh)
             .transpose(0, 1, 3, 2, 4).reshape(n_layers, width, three_w))
        b = (b.reshape(n_layers, 3, n_head, dh)
             .transpose(0, 2, 1, 3).reshape(n_layers, three_w))
    else:
        w = (w.reshape(n_layers, width, n_head, 3, dh)
             .transpose(0, 1, 3, 2, 4).reshape(n_layers, width, three_w))
        b = (b.reshape(n_layers, n_head, 3, dh)
             .transpose(0, 2, 1, 3).reshape(n_layers, three_w))
    return {**attn, "qkv_w": w, "qkv_b": b}


def relayout_clip(clip_tree: dict, cfg: ClipConfig, to_head_major: bool) -> dict:
    """Relayout one clip-params-shaped tree (params or a moment tree)."""
    out = dict(clip_tree)
    if not cfg.is_resnet and "visual" in out:
        vis = dict(out["visual"])
        blocks = dict(vis["blocks"])
        blocks["attn"] = _permute_qkv(blocks["attn"], cfg.vision_heads,
                                      to_head_major)
        vis["blocks"] = blocks
        out["visual"] = vis
    if "text" in out:
        txt = dict(out["text"])
        blocks = dict(txt["blocks"])
        blocks["attn"] = _permute_qkv(blocks["attn"], cfg.transformer_heads,
                                      to_head_major)
        txt["blocks"] = blocks
        out["text"] = txt
    return out


def _is_clip_tree(node: Any) -> bool:
    return (isinstance(node, dict) and isinstance(node.get("text"), dict)
            and "blocks" in node["text"])


def relayout_state(state: Any, cfg: ClipConfig, to_head_major: bool) -> Any:
    """Apply the qkv relayout to every clip-shaped subtree under a ``clip``
    key anywhere in the state — params plus the BertAdam m/v moment trees
    (which mirror the param structure and must stay elementwise-aligned)."""
    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            if _is_clip_tree(out.get("clip")):
                out["clip"] = relayout_clip(out["clip"], cfg, to_head_major)
            return out
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(walk(v) for v in node))
        if isinstance(node, (tuple, list)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(state)


# ---------------------------------------------------------------- sharding

# Megatron specs for the stacked [n_layers, ...] tower blocks.  qkv is
# head-major (see module docstring); out_w/proj_w shard the contraction
# axis, so their matmul outputs are partial sums that XLA all-reduces —
# the two per-block collectives.
_TP_BLOCK_SPECS = {
    ("attn", "qkv_w"): P(None, None, MODEL_AXIS),
    ("attn", "qkv_b"): P(None, MODEL_AXIS),
    ("attn", "out_w"): P(None, MODEL_AXIS, None),
    ("mlp", "fc_w"): P(None, None, MODEL_AXIS),
    ("mlp", "fc_b"): P(None, MODEL_AXIS),
    ("mlp", "proj_w"): P(None, MODEL_AXIS, None),
}


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a TrainState: tower block weights (and,
    via path matching, their m/v moments) Megatron-sharded, everything
    else replicated."""
    repl = NamedSharding(mesh, P())

    def spec_for(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if "clip" in names and "blocks" in names and len(names) >= 2:
            spec = _TP_BLOCK_SPECS.get((names[-2], names[-1]))
            if spec is not None and getattr(leaf, "ndim", -1) == len(spec):
                return NamedSharding(mesh, spec)
        return repl

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_state(state: Any, mesh: Mesh) -> Any:
    return jax.device_put(state, state_shardings(state, mesh))


def tensor_parallel_train_step(step_fn, mesh: Mesh, state: Any) -> Tuple[Any, Any]:
    """jit the raw ``(state, batch) -> (state, metrics)`` step with the TP
    state shardings pinned on both sides (stable layout across iterations,
    donation-friendly) and the live state placed accordingly.

    The batch is fed through the existing ``mesh.shard_batch`` (leading
    axis over ``data``); GSPMD propagates everything else.
    """
    sh = state_shardings(state, mesh)
    repl = NamedSharding(mesh, P())
    step = jax.jit(step_fn, out_shardings=(sh, repl), donate_argnums=(0,))
    return step, jax.device_put(state, sh)
