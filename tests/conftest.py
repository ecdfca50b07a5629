"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Mirrors the reference's `make test` harness role (reference lib Makefile:16-17)
but with NumPy/SciPy oracles and multi-device sharding tests, per SURVEY.md §4.

Unit tests always run on CPU: the ambient environment pins JAX at a single
remote TPU tunnel whose per-process plugin initialization blocks for minutes
and turns every micro-test into a network round trip.  If that tunnel env is
present we re-exec the test process once with it cleared (benchmarks use the
real chip separately via bench.py).
"""

import os

# Must be set before jax is imported anywhere.  (The remote-TPU tunnel env is
# cleared even earlier, by the _pytest_boot plugin loaded from pytest.ini.)
os.environ["JAX_PLATFORMS"] = "cpu"
# The XLA:CPU AOT cache loader logs a scary-but-cosmetic machine-feature
# mismatch (pseudo-features like +prefer-no-scatter recorded at compile time
# are absent from the host-feature probe of the SAME machine) once per cache
# hit; silence C++ logs in test processes.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Under pytest-xdist every worker creates 8 virtual devices, each with its
# own intra-op thread pool — on a small host the workers thrash (measured:
# sys time > user time).  One compute thread per virtual device is faster
# in aggregate.
if os.environ.get("PYTEST_XDIST_WORKER"):
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ["XLA_FLAGS"] += " --xla_cpu_multi_thread_eigen=false"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# NOTE: the persistent compilation cache (jax_compilation_cache_dir) was
# tried here and measured SLOWER than cold compiles for this suite on this
# host (cold 8:05, fully-warm 9:22 wall): hundreds of small entries where
# lookup + AOT deserialization rivals recompilation.  Left off deliberately.
