# Regular package marker.  Several tests put reference dirs on sys.path
# (e.g. stochman's root, which vendors its OWN regular `tests` package);
# without this file our `tests` is only a namespace package and Python's
# regular-beats-namespace rule lets stochman's shadow it, breaking
# `from tests.conftest import ...` depending on collection order.
