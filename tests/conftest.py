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

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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


def load_reference_module(relpath, name=None):
    """Import a module from the read-only reference tree by file path."""
    import importlib.util

    path = os.path.join(REFERENCE_ROOT, relpath)
    if not os.path.exists(path):
        import pytest

        pytest.skip(f"reference module {relpath} not available")
    name = name or ("ref_" + relpath.replace("/", "_").removesuffix(".py"))
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
