"""HuggingFace ``transformers.CLIPModel`` interop.

The reference can only consume OpenAI's torchscript ``.pt`` archives
(model/base/clip.py:86-133); most users today hold CLIP weights in the
HuggingFace layout instead (``openai/clip-vit-base-patch32`` et al.).  This
module converts both directions:

* ``load_hf_clip(model_or_dir)`` -> (ccmh params, ClipConfig): accepts a live
  ``CLIPModel``, an HF checkpoint *directory* (``config.json`` +
  ``model.safetensors``/``pytorch_model.bin``) or an HF-layout state dict.
  The HF keys are renamed to the OpenAI layout (q/k/v projections packed
  into ``in_proj_weight``, projections transposed) and the existing
  shape-driven converter (ccmh/clip/convert.py) does the rest — so
  architecture inference, scan-stacking and the patchify relayout are shared
  with the ``.pt`` path.
* ``to_hf_state_dict(params, cfg)`` / ``to_hf_model(params, cfg)``: the exact
  inverse — evaluate ccmh-trained towers in transformers (strict-load).

Only ViT CLIPs exist in the HF ``CLIPModel`` architecture; the
ModifiedResNet family (RN50 etc.) has no HF counterpart and is rejected
with a clear error.

CLI::

    python -m ccmh.clip.hf to-npz  <hf_dir_or_name> <out.npz>
    python -m ccmh.clip.hf from-ckpt <clip.npz|.pt> <out_dir>
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from ccmh.clip.model import ClipConfig, Params

_LAYER_RE = re.compile(r"^(text_model|vision_model)\.encoder\.layers\.(\d+)\.(.+)$")

# per-layer suffix renames (HF -> OpenAI); attention q/k/v handled separately
_SUFFIX = {
    "layer_norm1.weight": "ln_1.weight",
    "layer_norm1.bias": "ln_1.bias",
    "layer_norm2.weight": "ln_2.weight",
    "layer_norm2.bias": "ln_2.bias",
    "self_attn.out_proj.weight": "attn.out_proj.weight",
    "self_attn.out_proj.bias": "attn.out_proj.bias",
    "mlp.fc1.weight": "mlp.c_fc.weight",
    "mlp.fc1.bias": "mlp.c_fc.bias",
    "mlp.fc2.weight": "mlp.c_proj.weight",
    "mlp.fc2.bias": "mlp.c_proj.bias",
}

_TOP = {
    "text_model.embeddings.token_embedding.weight": "token_embedding.weight",
    "text_model.embeddings.position_embedding.weight": "positional_embedding",
    "text_model.final_layer_norm.weight": "ln_final.weight",
    "text_model.final_layer_norm.bias": "ln_final.bias",
    "vision_model.embeddings.class_embedding": "visual.class_embedding",
    "vision_model.embeddings.patch_embedding.weight": "visual.conv1.weight",
    "vision_model.embeddings.position_embedding.weight": "visual.positional_embedding",
    # transformers ships the historical "pre_layrnorm" typo; accept a
    # corrected spelling too in case it is ever fixed upstream
    "vision_model.pre_layrnorm.weight": "visual.ln_pre.weight",
    "vision_model.pre_layrnorm.bias": "visual.ln_pre.bias",
    "vision_model.pre_layernorm.weight": "visual.ln_pre.weight",
    "vision_model.pre_layernorm.bias": "visual.ln_pre.bias",
    "vision_model.post_layernorm.weight": "visual.ln_post.weight",
    "vision_model.post_layernorm.bias": "visual.ln_post.bias",
    "logit_scale": "logit_scale",
}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def hf_to_openai_state_dict(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """HF ``CLIPModel`` state dict -> OpenAI-layout state dict (numpy)."""
    out: Dict[str, np.ndarray] = {}
    qkv: Dict[Tuple[str, int, str], Dict[str, np.ndarray]] = {}
    for key, value in sd.items():
        if key.endswith("position_ids"):        # non-parameter buffer
            continue
        if key in _TOP:
            out[_TOP[key]] = _np(value)
            continue
        if key == "text_projection.weight":
            # HF Linear(width->embed, no bias) acts x @ W^T; OpenAI stores
            # the [width, embed] matrix applied as x @ P.
            out["text_projection"] = _np(value).T
            continue
        if key == "visual_projection.weight":
            out["visual.proj"] = _np(value).T
            continue
        m = _LAYER_RE.match(key)
        if m is None:
            raise ValueError(f"unrecognized HF CLIP key: {key!r}")
        tower, i, suffix = m.group(1), int(m.group(2)), m.group(3)
        prefix = "transformer" if tower == "text_model" else "visual.transformer"
        oai = f"{prefix}.resblocks.{i}."
        if suffix in _SUFFIX:
            out[oai + _SUFFIX[suffix]] = _np(value)
            continue
        qm = re.match(r"^self_attn\.([qkv])_proj\.(weight|bias)$", suffix)
        if qm is None:
            raise ValueError(f"unrecognized HF CLIP key: {key!r}")
        qkv.setdefault((prefix, i, qm.group(2)), {})[qm.group(1)] = _np(value)
    for (prefix, i, kind), parts in qkv.items():
        if set(parts) != {"q", "k", "v"}:
            raise ValueError(
                f"incomplete q/k/v set for {prefix}.resblocks.{i} ({kind})")
        name = "in_proj_weight" if kind == "weight" else "in_proj_bias"
        out[f"{prefix}.resblocks.{i}.attn.{name}"] = np.concatenate(
            [parts["q"], parts["k"], parts["v"]], axis=0)
    if "vision_model.embeddings.patch_embedding.weight" in sd and \
            "visual.ln_pre.weight" not in out:
        raise ValueError("HF vision tower missing pre-LayerNorm weights")
    return out


def _looks_like_hf(sd: Dict[str, Any]) -> bool:
    return any(k.startswith(("text_model.", "vision_model.")) for k in sd)


def load_hf_clip(source) -> Tuple[Params, ClipConfig]:
    """HF CLIP (``CLIPModel`` instance, checkpoint dir/name, or HF-layout
    state dict) -> (ccmh params, inferred ClipConfig).

    Head counts come from the HF config when available.  A raw state dict
    carries no head-count information, so that form assumes the OpenAI
    convention (head_dim 64, heads = width // 64) — pass the model or
    checkpoint directory for architectures that deviate."""
    import dataclasses

    from ccmh.clip.convert import convert_state_dict

    hf_cfg = None
    if isinstance(source, dict):
        sd = source
    elif isinstance(source, str):
        from transformers import CLIPModel

        model = CLIPModel.from_pretrained(source)
        sd, hf_cfg = model.state_dict(), model.config
    else:                                   # live torch module
        sd = source.state_dict()
        if not _looks_like_hf(sd):
            raise ValueError("module does not look like a transformers CLIPModel")
        hf_cfg = getattr(source, "config", None)
    params, cfg = convert_state_dict(hf_to_openai_state_dict(sd))
    if hf_cfg is not None:
        # shape inference assumes head_dim 64 (every OpenAI CLIP); the HF
        # config is authoritative — silently-wrong heads produce garbage
        # features, so override text heads and reject unrepresentable vision
        # head counts (ClipConfig derives vision_heads as width // 64).
        text_heads = hf_cfg.text_config.num_attention_heads
        vision_heads = hf_cfg.vision_config.num_attention_heads
        if text_heads != cfg.transformer_heads:
            cfg = dataclasses.replace(cfg, transformer_heads=text_heads)
        if vision_heads != cfg.vision_heads:
            raise ValueError(
                f"HF vision tower uses {vision_heads} attention heads but "
                f"width {cfg.vision_width} implies {cfg.vision_heads} at the "
                f"OpenAI head_dim of 64 — this architecture cannot be "
                f"represented")
    return params, cfg


# ---------------------------------------------------------------------------
# export: ccmh params -> HF
# ---------------------------------------------------------------------------

def _unstack(blocks: Params, i: int) -> Params:
    import jax

    return jax.tree.map(lambda x: np.asarray(x[i], np.float32), blocks)


def to_hf_state_dict(params: Params, cfg: ClipConfig) -> Dict[str, np.ndarray]:
    """ccmh CLIP params -> HF ``CLIPModel`` state dict (numpy values).

    Inverse of :func:`hf_to_openai_state_dict` ∘ ``convert_state_dict``:
    un-stacks the scanned blocks, splits packed qkv back into q/k/v
    projections and restores the [W, 3, P, P] conv layout from the
    patchify matmul weight."""
    if cfg.is_resnet:
        raise ValueError("HF CLIPModel has no ModifiedResNet tower; only ViT "
                         "CLIPs can be exported")
    if cfg.qkv_layout != "packed":
        raise ValueError("export expects the canonical packed qkv layout; "
                         "pass Trainer._canonical_state output")
    v, t = params["visual"], params["text"]
    P, W = cfg.vision_patch_size, cfg.vision_width
    sd: Dict[str, np.ndarray] = {
        "logit_scale": np.asarray(params["logit_scale"], np.float32),
        "text_projection.weight": np.asarray(t["text_projection"], np.float32).T,
        "visual_projection.weight": np.asarray(v["proj"], np.float32).T,
        "text_model.embeddings.token_embedding.weight":
            np.asarray(t["token_embedding"], np.float32),
        "text_model.embeddings.position_embedding.weight":
            np.asarray(t["positional_embedding"], np.float32),
        "text_model.final_layer_norm.weight": np.asarray(t["ln_final"]["scale"], np.float32),
        "text_model.final_layer_norm.bias": np.asarray(t["ln_final"]["bias"], np.float32),
        "vision_model.embeddings.class_embedding":
            np.asarray(v["class_embedding"], np.float32),
        "vision_model.embeddings.position_embedding.weight":
            np.asarray(v["positional_embedding"], np.float32),
        # patch_w is [(ph, pw, c), W] (convert.py:113-115); conv wants [W, C, Ph, Pw]
        "vision_model.embeddings.patch_embedding.weight":
            np.asarray(v["patch_w"], np.float32).reshape(P, P, 3, W).transpose(3, 2, 0, 1),
        "vision_model.pre_layrnorm.weight": np.asarray(v["ln_pre"]["scale"], np.float32),
        "vision_model.pre_layrnorm.bias": np.asarray(v["ln_pre"]["bias"], np.float32),
        "vision_model.post_layernorm.weight": np.asarray(v["ln_post"]["scale"], np.float32),
        "vision_model.post_layernorm.bias": np.asarray(v["ln_post"]["bias"], np.float32),
    }
    for tower, blocks, n_layers in (
        ("text_model", t["blocks"], cfg.transformer_layers),
        ("vision_model", v["blocks"], cfg.vision_layers),
    ):
        for i in range(n_layers):
            b = _unstack(blocks, i)
            pre = f"{tower}.encoder.layers.{i}."
            in_w = b["attn"]["qkv_w"].T       # [3W, W], rows = q|k|v
            in_b = b["attn"]["qkv_b"]
            width = in_w.shape[1]
            for j, name in enumerate("qkv"):
                sd[pre + f"self_attn.{name}_proj.weight"] = in_w[j * width:(j + 1) * width]
                sd[pre + f"self_attn.{name}_proj.bias"] = in_b[j * width:(j + 1) * width]
            sd[pre + "self_attn.out_proj.weight"] = b["attn"]["out_w"].T
            sd[pre + "self_attn.out_proj.bias"] = b["attn"]["out_b"]
            sd[pre + "layer_norm1.weight"] = b["ln_1"]["scale"]
            sd[pre + "layer_norm1.bias"] = b["ln_1"]["bias"]
            sd[pre + "layer_norm2.weight"] = b["ln_2"]["scale"]
            sd[pre + "layer_norm2.bias"] = b["ln_2"]["bias"]
            sd[pre + "mlp.fc1.weight"] = b["mlp"]["fc_w"].T
            sd[pre + "mlp.fc1.bias"] = b["mlp"]["fc_b"]
            sd[pre + "mlp.fc2.weight"] = b["mlp"]["proj_w"].T
            sd[pre + "mlp.fc2.bias"] = b["mlp"]["proj_b"]
    return sd


def make_hf_config(cfg: ClipConfig):
    """ClipConfig -> ``transformers.CLIPConfig`` (quick_gelu activations)."""
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

    text = CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.transformer_width,
        intermediate_size=cfg.transformer_width * 4,
        num_hidden_layers=cfg.transformer_layers,
        num_attention_heads=cfg.transformer_heads,
        max_position_embeddings=cfg.context_length,
        hidden_act="quick_gelu",
        # CLIP's EOT id; also the argmax of any valid id sequence, so HF's
        # eos pooling selects the same token as the reference's argmax
        # pooling (model/base/model.py:370)
        eos_token_id=cfg.vocab_size - 1,
        bos_token_id=cfg.vocab_size - 2,
    )
    vision = CLIPVisionConfig(
        hidden_size=cfg.vision_width,
        intermediate_size=cfg.vision_width * 4,
        num_hidden_layers=cfg.vision_layers,
        num_attention_heads=cfg.vision_heads,
        image_size=cfg.image_resolution,
        patch_size=cfg.vision_patch_size,
        hidden_act="quick_gelu",
    )
    return CLIPConfig(text_config=text.to_dict(), vision_config=vision.to_dict(),
                      projection_dim=cfg.embed_dim)


def to_hf_model(params: Params, cfg: ClipConfig):
    """ccmh params -> a loaded ``transformers.CLIPModel`` (strict)."""
    import torch
    from transformers import CLIPModel

    model = CLIPModel(make_hf_config(cfg)).eval()
    sd = {k: torch.from_numpy(np.array(v, dtype=np.float32))
          for k, v in to_hf_state_dict(params, cfg).items()}
    # transformers < 4.31 registers position_ids as persistent buffers; take
    # the freshly-initialized model's own (they are just arange) so the
    # strict load succeeds on both old and new layouts
    for key, value in model.state_dict().items():
        if key.endswith("position_ids") and key not in sd:
            sd[key] = value
    model.load_state_dict(sd, strict=True)
    return model


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("to-npz", help="HF CLIP checkpoint dir -> torch-free .npz")
    p1.add_argument("source")
    p1.add_argument("out")
    p2 = sub.add_parser("from-ckpt",
                        help="ccmh CLIP checkpoint (.npz/.pt) -> HF save_pretrained dir")
    p2.add_argument("ckpt")
    p2.add_argument("out_dir")
    args = ap.parse_args(argv)
    if args.cmd == "to-npz":
        from ccmh.clip.convert import save_params_npz

        params, cfg = load_hf_clip(args.source)
        save_params_npz(args.out, params)
        print(f"wrote {args.out} ({cfg})")
    else:
        from ccmh.clip.convert import load_clip_params

        params, cfg = load_clip_params(args.ckpt)
        to_hf_model(params, cfg).save_pretrained(args.out_dir)
        print(f"wrote HF checkpoint to {args.out_dir} ({cfg})")


if __name__ == "__main__":
    main()
