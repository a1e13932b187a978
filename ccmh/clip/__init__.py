from ccmh.clip.model import (
    ClipConfig,
    VisionOutput,
    TextOutput,
    init_clip_params,
    encode_image,
    encode_text,
    clip_forward,
)
from ccmh.clip.convert import convert_torch_checkpoint, load_clip_params, save_params_npz

__all__ = [
    "ClipConfig", "VisionOutput", "TextOutput", "init_clip_params",
    "encode_image", "encode_text", "clip_forward",
    "convert_torch_checkpoint", "load_clip_params", "save_params_npz",
]
