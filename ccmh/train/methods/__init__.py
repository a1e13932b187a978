"""Method registry: one module per reference method (main.py:18-33).

The reference wires its 14 trainers through a static name->module dict
(main.py:18-33) that cannot lose entries silently; this registry makes the
same guarantee dynamically: every module in :data:`EXPECTED_METHODS` must
import and register, and any failure is raised — loudly — the first time
the registry is consulted.  ``available_methods()`` therefore IS the
coverage claim (the DP/TP sweeps and the driver dryrun iterate it), and a
typo'd dependency in one method module fails the whole suite instead of
silently shrinking the sweep to 13/14.
"""

from __future__ import annotations

from typing import Dict, List

from ccmh.train.methods.base import Method

_REGISTRY: Dict[str, Method] = {}

# module name -> method name it must register (reference main.py:18-33)
EXPECTED_METHODS: Dict[str, str] = {
    "dchmt": "DCHMT",
    "dsph": "DSPH",
    "dnph_tmm": "DNpH",
    "dhaph": "DHaPH",
    "dmsh_ln": "DMsH_LN",
    "dscph": "DScPH",
    "ddwsh": "DDWSH",
    "ddbh": "DDBH",
    "dnph_tomm": "DNPH",
    "twdh": "TwDH",
    "dpbe": "DPBE",
    "mith": "MITH",
    "dpsih": "DPSIH",
    "dghdgh": "DGHDGH",
}

_IMPORT_ERRORS: Dict[str, Exception] = {}
_LOADED = False


def register(method: Method) -> Method:
    _REGISTRY[method.name] = method
    return method


def get_method(name: str) -> Method:
    """The named method, if its module imported cleanly.

    A broken OPTIONAL dependency in one method module must not brick
    training of every unrelated method, so this succeeds whenever ``name``
    itself registered; the completeness guarantee (all 14 or a loud error)
    lives in :func:`available_methods`, which every sweep consults.
    """
    _ensure_loaded()
    if name in _REGISTRY:
        return _REGISTRY[name]
    # name absent: either ITS module broke (surface that error) or the
    # name is simply unknown
    _raise_if_incomplete()
    raise KeyError(f"unknown method {name!r}; available: {sorted(_REGISTRY)}")


def available_methods() -> List[str]:
    """All 14 reference methods — raises loudly if ANY failed to register
    (the DP/TP sweeps and the driver dryrun iterate this; a silently
    reduced set would shrink the coverage claim)."""
    _ensure_loaded()
    _raise_if_incomplete()
    return sorted(_REGISTRY)


def _ensure_loaded() -> None:
    # Import method modules lazily so `import ccmh` stays light; failures
    # are collected (not raised) so get_method can serve the methods that
    # DID import — available_methods() re-raises the collection.
    global _LOADED
    if _LOADED:
        return
    import importlib

    for mod in EXPECTED_METHODS:
        try:
            importlib.import_module(f"ccmh.train.methods.{mod}")
        except (KeyboardInterrupt, SystemExit):
            # a Ctrl-C / exit landing mid-import is a user action, not a
            # broken module — never swallow it into the error collection
            raise
        except Exception as e:  # noqa: BLE001 - collected, raised on demand
            _IMPORT_ERRORS[mod] = e
    _LOADED = True


def _raise_if_incomplete() -> None:
    missing = {m: n for m, n in EXPECTED_METHODS.items() if n not in _REGISTRY}
    if _IMPORT_ERRORS or missing:
        lines = [
            f"  ccmh.train.methods.{m}: {type(e).__name__}: {e}"
            for m, e in _IMPORT_ERRORS.items()
        ] + [
            f"  ccmh.train.methods.{m}: imported but did not register {n!r}"
            for m, n in missing.items()
            if m not in _IMPORT_ERRORS
        ]
        raise ImportError(
            "method registry incomplete — refusing to run with a silently "
            "reduced method set:\n" + "\n".join(lines)
        )
