"""Early pytest bootstrap (loaded via ``-p _pytest_boot`` in pytest.ini).

The ambient environment registers a remote-TPU PJRT plugin in every Python
process (sitecustomize); with it registered, JAX backend initialization blocks
on the network tunnel for minutes even when tests run on CPU.  This plugin
imports *before* pytest's capture starts, so we can re-exec the test process
once with the tunnel env cleared while stdout/stderr are still the real fds.

Benchmarks (bench.py) use the real TPU chip and do not go through pytest.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "_SPARSE_TPU_TEST_REEXEC"
):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["_SPARSE_TPU_TEST_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
