"""Checkpoint conversion: OpenAI torch CLIP -> ccmh param pytree.

Replaces the reference loader path (model/modelbase.py:60-67 ->
model/base/model.py:415-455 ``build_model``): architecture hyperparameters
are inferred from state_dict shapes the same way, but the output is a pure
jnp pytree (fp32) instead of a torch module.  Also provides flat .npz
save/load so TPU jobs never need torch at runtime.
"""

from __future__ import annotations

import io
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccmh.clip.model import ClipConfig, Params


def _infer_config(sd: Dict[str, Any]) -> ClipConfig:
    """Shape-driven architecture inference (model/base/model.py:415-438);
    RN-family checkpoints (no ``visual.proj``) select the ModifiedResNet
    tower exactly like the reference's build_model else-branch."""
    text = dict(
        embed_dim=sd["text_projection"].shape[1],
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len(
            set(k.split(".")[2] for k in sd if k.startswith("transformer.resblocks"))
        ),
    )
    if "visual.proj" not in sd:
        counts = tuple(
            len(set(k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")))
            for b in (1, 2, 3, 4)
        )
        output_width = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        return ClipConfig(
            image_resolution=output_width * 32,
            vision_layers=counts,
            vision_width=sd["visual.layer1.0.conv1.weight"].shape[0],
            vision_patch_size=None,
            **text,
        )
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len(
        [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
    )
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid_size = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    return ClipConfig(
        image_resolution=vision_patch_size * grid_size,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        **text,
    )


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _convert_blocks(sd: Dict[str, Any], prefix: str, n_layers: int) -> Params:
    """Stack per-layer torch weights into scan-ready [L, ...] arrays."""
    def get(i: int, name: str) -> np.ndarray:
        return _to_np(sd[f"{prefix}.resblocks.{i}.{name}"])

    layers = []
    for i in range(n_layers):
        layers.append({
            "ln_1": {"scale": get(i, "ln_1.weight"), "bias": get(i, "ln_1.bias")},
            "attn": {
                # torch stores [3W, W] acting as x @ W^T; transpose once here
                # so the forward is a plain x @ qkv_w.
                "qkv_w": get(i, "attn.in_proj_weight").T,
                "qkv_b": get(i, "attn.in_proj_bias"),
                "out_w": get(i, "attn.out_proj.weight").T,
                "out_b": get(i, "attn.out_proj.bias"),
            },
            "ln_2": {"scale": get(i, "ln_2.weight"), "bias": get(i, "ln_2.bias")},
            "mlp": {
                "fc_w": get(i, "mlp.c_fc.weight").T,
                "fc_b": get(i, "mlp.c_fc.bias"),
                "proj_w": get(i, "mlp.c_proj.weight").T,
                "proj_b": get(i, "mlp.c_proj.bias"),
            },
        })
    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *layers)


def convert_state_dict(sd: Dict[str, Any]) -> Tuple[Params, ClipConfig]:
    """torch CLIP state_dict -> (ccmh params, inferred config)."""
    cfg = _infer_config(sd)
    if cfg.is_resnet:
        from ccmh.clip.resnet import convert_resnet_visual

        visual = convert_resnet_visual(sd, cfg.vision_layers)
        return {
            "visual": visual,
            "text": _convert_text(sd, cfg),
            "logit_scale": jnp.asarray(_to_np(sd["logit_scale"])),
        }, cfg
    conv = _to_np(sd["visual.conv1.weight"])               # [W, 3, P, P]
    # [W, C, Ph, Pw] -> [Ph, Pw, C, W] -> [(ph, pw, c), W]: matches the
    # (ph, pw, channel) patch flattening order of model.patchify.
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.vision_width)

    params: Params = {
        "visual": {
            "patch_w": jnp.asarray(patch_w),
            "class_embedding": jnp.asarray(_to_np(sd["visual.class_embedding"])),
            "positional_embedding": jnp.asarray(_to_np(sd["visual.positional_embedding"])),
            "ln_pre": {
                "scale": jnp.asarray(_to_np(sd["visual.ln_pre.weight"])),
                "bias": jnp.asarray(_to_np(sd["visual.ln_pre.bias"])),
            },
            "blocks": _convert_blocks(sd, "visual.transformer", cfg.vision_layers),
            "ln_post": {
                "scale": jnp.asarray(_to_np(sd["visual.ln_post.weight"])),
                "bias": jnp.asarray(_to_np(sd["visual.ln_post.bias"])),
            },
            "proj": jnp.asarray(_to_np(sd["visual.proj"])),
        },
        "text": _convert_text(sd, cfg),
        "logit_scale": jnp.asarray(_to_np(sd["logit_scale"])),
    }
    return params, cfg


def _convert_text(sd: Dict[str, Any], cfg: ClipConfig) -> Params:
    return {
        "token_embedding": jnp.asarray(_to_np(sd["token_embedding.weight"])),
        "positional_embedding": jnp.asarray(_to_np(sd["positional_embedding"])),
        "blocks": _convert_blocks(sd, "transformer", cfg.transformer_layers),
        "ln_final": {
            "scale": jnp.asarray(_to_np(sd["ln_final.weight"])),
            "bias": jnp.asarray(_to_np(sd["ln_final.bias"])),
        },
        "text_projection": jnp.asarray(_to_np(sd["text_projection"])),
    }


def convert_torch_checkpoint(path: str) -> Tuple[Params, ClipConfig]:
    """Load an OpenAI CLIP .pt (torchscript archive or plain state_dict)."""
    import torch  # host-side only; never imported on the TPU compute path

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
    from ccmh.clip.hf import _looks_like_hf, load_hf_clip

    if _looks_like_hf(sd):
        return load_hf_clip(sd)
    for key in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(key, None)
    return convert_state_dict(sd)


# ---------------------------------------------------------------------------
# torch-free .npz persistence
# ---------------------------------------------------------------------------

def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_params_npz(path: str, params: Params) -> None:
    np.savez(path, **_flatten(params))


def load_params_npz(path: str) -> Tuple[Params, ClipConfig]:
    with np.load(path) as data:
        params = _unflatten({k: data[k] for k in data.files})
    v, t = params["visual"], params["text"]
    text = dict(
        embed_dim=t["text_projection"].shape[1],
        context_length=t["positional_embedding"].shape[0],
        vocab_size=t["token_embedding"].shape[0],
        transformer_width=t["token_embedding"].shape[1],
        transformer_heads=t["token_embedding"].shape[1] // 64,
        transformer_layers=t["blocks"]["ln_1"]["scale"].shape[0],
    )
    if "stem" in v:        # ModifiedResNet tree
        spacial = int(math.isqrt(v["attnpool"]["positional_embedding"].shape[0] - 1))
        cfg = ClipConfig(
            image_resolution=spacial * 32,
            vision_layers=tuple(
                len(v[f"layer{i}"]) for i in (1, 2, 3, 4)),
            vision_width=v["layer1"]["0"]["conv1"].shape[3],
            vision_patch_size=None,
            **text,
        )
        return params, cfg
    patch = int(math.isqrt(v["patch_w"].shape[0] // 3))
    grid = int(math.isqrt(v["positional_embedding"].shape[0] - 1))
    cfg = ClipConfig(
        image_resolution=patch * grid,
        vision_layers=v["blocks"]["ln_1"]["scale"].shape[0],
        vision_width=v["patch_w"].shape[1],
        vision_patch_size=patch,
        **text,
    )
    return params, cfg


def load_clip_params(path: str) -> Tuple[Params, ClipConfig]:
    """Dispatch: .npz (torch-free), a HuggingFace checkpoint directory
    (config.json + safetensors/bin — ccmh/clip/hf.py), or a torch .pt
    archive / state dict (HF-layout state dicts inside a .pt are detected
    and routed through the HF converter too)."""
    import os

    if path.endswith(".npz"):
        return load_params_npz(path)
    if os.path.isdir(path):
        from ccmh.clip.hf import load_hf_clip

        return load_hf_clip(path)
    return convert_torch_checkpoint(path)
