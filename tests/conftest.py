"""Test harness config.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware; the real chip is reserved for bench.py).  Environment
variables must be set before jax is first imported, hence this module-level
code in conftest.
"""

import os
import sys
import types
import unicodedata

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
        sys.modules["ftfy"] = stub


# torchvision is absent; reference model/base/clip.py only needs transform
# symbols at import time, so stub them for the parity oracles.
if "torchvision" not in sys.modules:
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        for _name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
            setattr(tvt, _name, type(_name, (), {"__init__": lambda self, *a, **k: None}))
        tvt.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt


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
