"""Test harness config.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware; the real chip is reserved for bench.py).  Environment
variables must be set before jax is first imported, hence this module-level
code in conftest.
"""

import importlib.machinery
import os
import sys
import types
import unicodedata

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8")
if "collective_call_terminate" not in xla_flags:
    # 8 virtual devices on ONE core: every cross-device collective is N
    # starved threads rendezvousing; late in the full suite a participant
    # can be scheduled out past XLA:CPU's default terminate timeout, which
    # ABORTS the process (observed: SIGABRT in test_tp at ~70% of the
    # suite, with 20s "may be stuck ... unstuck! false-positive" warnings
    # in smaller repros).  Raise both thresholds far beyond worst-case
    # 1-core scheduling skew.
    xla_flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = xla_flags.strip()

# The image's sitecustomize imports jax at interpreter start (axon TPU
# plugin), freezing JAX_PLATFORMS before conftest runs — override through
# the live config instead.  Tests run on 8 virtual CPU devices; matmuls in
# full fp32 so torch-parity tolerances are meaningful.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"
sys.path.insert(0, REPO_ROOT)

# The reference tokenizer imports ftfy, which is not installed here.  For
# ASCII test strings ftfy.fix_text is the identity, so a stub suffices to use
# the reference as a parity oracle.
if "ftfy" not in sys.modules:
    try:
        import ftfy  # noqa: F401
    except ImportError:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: unicodedata.normalize("NFC", s)
        # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
        # availability probes) doesn't raise on the stub
        stub.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
        sys.modules["ftfy"] = stub


# torchvision is absent; the reference needs its transform pipeline both at
# import time (model/base/clip.py) and EXECUTABLY (dataset/base.py:35-44 —
# the whole-loop parity harness runs the real reference data pipeline).
# Provide a functional stub faithful to torchvision semantics: Resize
# (short-side int or exact tuple, torchvision's int() rounding), CenterCrop
# (round() offsets), ToTensor (CHW [0,1] float32), Normalize.
if "torchvision" not in sys.modules:
    try:
        import torchvision  # noqa: F401
    except ImportError:
        def _make_torchvision_stub():
            tv = types.ModuleType("torchvision")
            tvt = types.ModuleType("torchvision.transforms")

            class Compose:
                def __init__(self, transforms):
                    self.transforms = transforms

                def __call__(self, x):
                    for t in self.transforms:
                        x = t(x)
                    return x

            class Resize:
                def __init__(self, size, interpolation=None):
                    self.size = size
                    self.interpolation = interpolation

                def __call__(self, img):
                    from PIL import Image

                    interp = (self.interpolation
                              if isinstance(self.interpolation, int)
                              else Image.BICUBIC)
                    if isinstance(self.size, (tuple, list)):
                        h, w = self.size
                        return img.resize((w, h), interp)
                    size = self.size
                    w, h = img.size
                    short, long = (w, h) if w <= h else (h, w)
                    if short == size:
                        return img
                    new_short, new_long = size, int(size * long / short)
                    ow, oh = ((new_short, new_long) if w <= h
                              else (new_long, new_short))
                    return img.resize((ow, oh), interp)

            class CenterCrop:
                def __init__(self, size):
                    self.size = (size, size) if isinstance(size, int) else size

                def __call__(self, img):
                    th, tw = self.size
                    w, h = img.size
                    left = int(round((w - tw) / 2.0))
                    top = int(round((h - th) / 2.0))
                    return img.crop((left, top, left + tw, top + th))

            class ToTensor:
                def __call__(self, img):
                    import numpy as _np
                    import torch as _torch

                    arr = _np.asarray(img, _np.float32) / 255.0
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    return _torch.from_numpy(arr.transpose(2, 0, 1).copy())

            class Normalize:
                def __init__(self, mean, std):
                    import torch as _torch

                    self.mean = _torch.tensor(mean).view(-1, 1, 1)
                    self.std = _torch.tensor(std).view(-1, 1, 1)

                def __call__(self, t):
                    return (t - self.mean) / self.std

            for _n, _c in (("Compose", Compose), ("Resize", Resize),
                           ("CenterCrop", CenterCrop), ("ToTensor", ToTensor),
                           ("Normalize", Normalize)):
                setattr(tvt, _n, _c)
            tvt.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
            tv.transforms = tvt
            return tv, tvt

        _tv, _tvt = _make_torchvision_stub()
        _tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
        _tvt.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.transforms", loader=None)
        sys.modules["torchvision"] = _tv
        sys.modules["torchvision.transforms"] = _tvt


# xlrd is absent (and xlrd>=2 cannot read .xlsx anyway); reference DSPH/DMsH
# loss modules import it at module level to read codetable.xlsx.  Back a
# minimal stub with ccmh's stdlib xlsx reader so those modules load as
# parity oracles; relative paths resolve against the reference root.
if "xlrd" not in sys.modules:
    try:
        import xlrd  # noqa: F401
    except ImportError:
        def _make_xlrd_stub():
            stub = types.ModuleType("xlrd")

            class _Cell:
                def __init__(self, v):
                    self.value = v

            class _Sheet:
                def __init__(self, grid):
                    self._grid = grid

                def row(self, i):
                    return [_Cell(v) for v in self._grid[i]]

            class _Book:
                def __init__(self, grid):
                    self._grid = grid

                def sheet_by_index(self, i):
                    return _Sheet(self._grid)

            def open_workbook(path):
                from ccmh.utils.xlsx import read_sheet

                if not os.path.isabs(path):
                    path = os.path.join(REFERENCE_ROOT, path)
                return _Book(read_sheet(path))

            stub.open_workbook = open_workbook
            stub.__spec__ = importlib.machinery.ModuleSpec("xlrd", loader=None)
            return stub

        sys.modules["xlrd"] = _make_xlrd_stub()


def load_reference_module(relpath, name=None, strip_relative=False):
    """Import a module from the read-only reference tree by file path.

    ``strip_relative=True`` drops ``from .x import y`` lines (e.g. trainer-local
    get_args imports) so a loss module can load standalone as a test oracle.
    """
    import types as _types

    path = os.path.join(REFERENCE_ROOT, relpath)
    if not os.path.exists(path):
        import pytest

        pytest.skip(f"reference module {relpath} not available")
    name = name or ("ref_" + relpath.replace("/", "_").removesuffix(".py"))
    with open(path) as fh:
        source = fh.read()
    if strip_relative:
        source = "\n".join(
            line for line in source.split("\n")
            if not line.strip().startswith("from .")
        )
    mod = _types.ModuleType(name)
    mod.__file__ = path
    exec(compile(source, path, "exec"), mod.__dict__)
    return mod


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly marked slow belongs to the `fast` tier, so
    `pytest -m fast` is a <60s verification pass and `-m slow` the rest."""
    import pytest

    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)
