"""Test configuration: run on a virtual 8-device CPU mesh by default.

Multi-chip sharding is validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) so no real pod is
needed; set DIE_E_TEST_TPU=1 to run the suite on real accelerators.
"""

import os
import sys

if os.environ.get("DIE_E_TEST_TPU", "0") != "1":
    # force (not setdefault): the ambient environment may point
    # JAX_PLATFORMS at a real accelerator
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # a PJRT plugin registered from sitecustomize (before conftest runs)
    # can override JAX_PLATFORMS; the config update after import wins
    import jax

    jax.config.update("jax_platforms", "cpu")

# make the repo root importable (die_e_tpu, parity)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
