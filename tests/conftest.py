"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md section 4 test plan).  The config
update must happen before any backend is initialized; the axon sitecustomize
in this image force-selects the TPU tunnel otherwise.

RELIABILITY NOTE (r3, NOTES_ROUND3.md): on this box the suite segfaults
inside XLA CPU compilation/deserialization of the largest engine program
(test_engine.py::test_macro_equals_key_sequence) when a heavy concurrent
process (TPU training run, Mosaic compile) is running — reproduced 5x
under load, 0x on a quiet machine, with and without the persistent cache.
Run the suite without concurrent heavy jobs.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from drl_tetris_tpu import enable_compilation_cache  # noqa: E402

# The engine step (~40 s) and finesse kernel (~10 min) dominate suite
# wall-time on this box; persist their compiles across pytest runs.
enable_compilation_cache()
