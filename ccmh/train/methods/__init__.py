"""Method registry: one module per reference method (main.py:18-33)."""

from __future__ import annotations

from typing import Dict

from ccmh.train.methods.base import Method

_REGISTRY: Dict[str, Method] = {}


def register(method: Method) -> Method:
    _REGISTRY[method.name] = method
    return method


def get_method(name: str) -> Method:
    _ensure_loaded()
    if name not in _REGISTRY:
        raise KeyError(f"unknown method {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available_methods():
    _ensure_loaded()
    return sorted(_REGISTRY)


def _ensure_loaded():
    # Import method modules lazily so `import ccmh` stays light.
    import importlib

    for mod in (
        "dchmt", "dsph", "dnph_tmm", "dhaph", "dmsh_ln", "dscph", "ddwsh",
        "ddbh", "dnph_tomm", "twdh", "dpbe", "mith", "dpsih", "dghdgh",
    ):
        try:
            importlib.import_module(f"ccmh.train.methods.{mod}")
        except ImportError:
            pass
