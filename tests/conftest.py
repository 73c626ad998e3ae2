"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md section 4 test plan).  The config
update must happen before any backend is initialized; the axon sitecustomize
in this image force-selects the TPU tunnel otherwise.

RELIABILITY NOTE (r3->r5): two distinct cache-poisoning crashes, same
cpu_aot_loader symptom.  (r3->r4) the persistent XLA cache was SHARED
across machines via ~/.cache, and XLA:CPU AOT executables embed the
compiling host's CPU feature set — loading one on a host with different
features SIGILLs.  Fixed by keying the cache dir on a CPU-model+flags
fingerprint.  (r5) the SAME machine can still poison itself: a process
with torch/tensorflow native libs loaded compiles XLA:CPU executables
with different target-tuning features (+prefer-no-scatter/+prefer-no-
gather — reproduced minimally, docs/NOTES_ROUND5.md), and a torch-free
process (this test suite) deserializing such an entry can SIGSEGV inside
compilation_cache.get_executable_and_time.  Fixed by ALSO keying the
cache dir on the taint state (drl_tetris_tpu/__init__._taint_tag): the
suite shares the '-plain' namespace with bench/eval; CLI training
processes import torch eagerly and use '-tf'.
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
