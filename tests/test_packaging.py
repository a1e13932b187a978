"""Packaging sanity (pyproject.toml).

The reference ships as a loose script tree (no packaging at all); ccmh is
pip-installable.  These tests keep the wheel honest without invoking pip:
every package-data glob must match real files (so assets and the native
C++ sources actually ship), and every console entry point must resolve to
an importable callable.
"""

import glob
import os
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_package_data_globs_match_files():
    data = _pyproject()["tool"]["setuptools"]["package-data"]["ccmh"]
    for pattern in data:
        hits = glob.glob(os.path.join(REPO, "ccmh", pattern))
        assert hits, f"package-data glob matches nothing: {pattern}"


def test_console_entry_points_importable():
    import importlib

    for name, target in _pyproject()["project"]["scripts"].items():
        module, func = target.split(":")
        obj = getattr(importlib.import_module(module), func)
        assert callable(obj), (name, target)


def test_required_assets_present():
    for rel in (
        "assets/bpe_simple_vocab_16e6.txt.gz",
        "assets/codetable.xlsx",
        "assets/twdh/coco.npz",
        "assets/twdh/nuswide.npz",
        "assets/twdh/mirflickr.npz",
        "data/native/loader.cpp",
        "tokenizer/native/bpe.cpp",
    ):
        assert os.path.isfile(os.path.join(REPO, "ccmh", rel)), rel
