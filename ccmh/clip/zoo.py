"""OpenAI CLIP model zoo: download-by-name + one-call load.

Parity surface for the reference loader helpers (model/base/clip.py:29-68:
``available_models``/``_download``/``load``) without torch at runtime:
``load("ViT-B/32")`` fetches the official checkpoint (SHA256-pinned URLs —
public constants), converts it once to the torch-free ``.npz`` pytree, and
caches both next to each other.  All RN50-family and ViT entries are
supported by the converter (ccmh/clip/{convert,resnet}.py).
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
from typing import List, Tuple

from ccmh.clip.convert import (convert_torch_checkpoint, load_params_npz,
                               save_params_npz)

_BASE = "https://openaipublic.azureedge.net/clip/models"
_MODELS = {
    # name -> (sha256, filename); URL = _BASE/sha256/filename
    # first six = the reference's zoo (model/base/clip.py:30-35); the last
    # three extend it with the remaining official OpenAI releases (the
    # converter and ClipConfig inference are shape-driven, and ViT-L-class
    # towers are the natural tensor-parallelism targets, parallel/tp.py).
    # A wrong pin cannot load silently: the sha is both the URL path and
    # the post-download integrity check.
    "RN50": ("afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762", "RN50.pt"),
    "RN101": ("8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599", "RN101.pt"),
    "RN50x4": ("7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd", "RN50x4.pt"),
    "RN50x16": ("52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa", "RN50x16.pt"),
    "ViT-B/32": ("40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af", "ViT-B-32.pt"),
    "ViT-B/16": ("5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f", "ViT-B-16.pt"),
    "RN50x64": ("be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c", "RN50x64.pt"),
    "ViT-L/14": ("b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836", "ViT-L-14.pt"),
    "ViT-L/14@336px": ("3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02", "ViT-L-14-336px.pt"),
}


def available_models() -> List[str]:
    """Names accepted by :func:`download` / :func:`load`
    (reference model/base/clip.py:81-83)."""
    return list(_MODELS)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download(name: str, root: str = "~/.cache/ccmh") -> str:
    """Fetch a named checkpoint with SHA256 verification; returns the local
    .pt path (cached re-use when the checksum already matches)."""
    if name not in _MODELS:
        raise KeyError(f"unknown model {name!r}; available: {available_models()}")
    sha, filename = _MODELS[name]
    root = os.path.expanduser(root)
    os.makedirs(root, exist_ok=True)
    target = os.path.join(root, filename)
    if os.path.isfile(target) and _sha256(target) == sha:
        return target
    url = f"{_BASE}/{sha}/{filename}"
    tmp = target + ".part"
    with urllib.request.urlopen(url) as src, open(tmp, "wb") as out:
        while True:
            buf = src.read(1 << 20)
            if not buf:
                break
            out.write(buf)
    if _sha256(tmp) != sha:
        os.unlink(tmp)
        raise RuntimeError(f"SHA256 mismatch downloading {name}")
    os.replace(tmp, target)
    return target


def load(name_or_path: str, root: str = "~/.cache/ccmh") -> Tuple[dict, object]:
    """(params, ClipConfig) by zoo name or local path.

    Zoo names are downloaded (once), converted from torch, and cached as
    torch-free ``.npz`` so subsequent loads never import torch.
    """
    if os.path.exists(name_or_path):
        from ccmh.clip.convert import load_clip_params

        return load_clip_params(name_or_path)
    pt = download(name_or_path, root)
    npz = pt[:-3] + ".npz"
    if os.path.isfile(npz):
        return load_params_npz(npz)
    params, cfg = convert_torch_checkpoint(pt)
    import jax
    import numpy as np

    save_params_npz(npz, jax.tree.map(np.asarray, params))
    return params, cfg
