"""Host-feature-safe persistent-compile-cache keying (VERDICT r4 #3).

XLA:CPU AOT executables embed the compiling host's LLVM target features;
deserializing one on a host with a different feature set warns of SIGILL.
The cache must therefore namespace CPU entries by a host ISA fingerprint
while keeping the TPU cache (chip-targeted, host-independent) shared.
"""

import os

import jax

from ccmh.utils.compile_cache import (
    cache_dir_for_backend,
    cpu_feature_fingerprint,
    enable_compilation_cache,
)

CPUINFO_A = "processor : 0\nflags\t\t: fpu sse sse2 avx avx2 avx512f\n"
CPUINFO_B = "processor : 0\nflags\t\t: fpu sse sse2 avx avx2\n"  # no avx512
CPUINFO_A_REORDERED = "processor : 0\nflags\t\t: avx512f avx2 avx sse2 sse fpu\n"


def test_fingerprint_stable_and_feature_sensitive():
    a1 = cpu_feature_fingerprint(CPUINFO_A)
    a2 = cpu_feature_fingerprint(CPUINFO_A)
    b = cpu_feature_fingerprint(CPUINFO_B)
    assert a1 == a2
    assert a1 != b  # a missing ISA extension MUST change the namespace
    assert len(a1) == 12


def test_fingerprint_order_normalized():
    """Kernels may list identical features in different orders — same
    silicon must share the warm cache."""
    assert (cpu_feature_fingerprint(CPUINFO_A)
            == cpu_feature_fingerprint(CPUINFO_A_REORDERED))


def test_fingerprint_reads_this_host():
    fp = cpu_feature_fingerprint()
    assert len(fp) == 12 and fp == cpu_feature_fingerprint()


def test_cache_dir_cpu_namespaced_tpu_shared(tmp_path):
    root = str(tmp_path / "xc")
    cpu_dir = cache_dir_for_backend(root, "cpu", CPUINFO_A)
    assert os.path.dirname(cpu_dir) == os.path.abspath(root)
    assert os.path.basename(cpu_dir) == f"cpu-{cpu_feature_fingerprint(CPUINFO_A)}"
    # a host with different features gets a DIFFERENT namespace
    assert cpu_dir != cache_dir_for_backend(root, "cpu", CPUINFO_B)
    # TPU executables are chip-targeted: shared top-level directory
    assert cache_dir_for_backend(root, "tpu") == os.path.abspath(root)


def test_enable_points_jax_at_namespaced_dir(tmp_path):
    root = str(tmp_path / "xc")
    try:
        enable_compilation_cache(root)
        got = jax.config.jax_compilation_cache_dir
        # the test harness runs on the cpu backend -> namespaced subdir
        assert got == cache_dir_for_backend(root, jax.default_backend())
        if jax.default_backend() == "cpu":
            assert os.path.basename(got).startswith("cpu-")
        assert os.path.isdir(got)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
