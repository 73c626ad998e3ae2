"""drl-tetris-tpu: a TPU-native rebuild of DRL-Tetris (see SURVEY.md).

Importing the package (or calling ``enable_compilation_cache``) points JAX
at a persistent XLA compilation cache so that separate processes —
trainer, league evals, bench, tests — reuse each other's compiles instead
of re-paying the multi-minute engine/finesse compilation.  Set
JAX_COMPILATION_CACHE_DIR to redirect it, or to "" to disable.

The cache directory is keyed by TWO fingerprints, both learned from real
crashes:

* a CPU model+flags fingerprint (r4): XLA:CPU serializes AOT executables
  specialized to the compiling host's CPU features, and loading one on a
  host with a different feature set SIGILLs ("Machine type used for
  XLA:CPU compilation doesn't match the machine type for execution",
  cpu_aot_loader).
* a torch/TF-taint tag (r5): loading torch/tensorflow native libraries
  in a process flips XLA:CPU's chosen LLVM *target tuning* features
  (+prefer-no-scatter/+prefer-no-gather — measured, docs/NOTES_ROUND5.md)
  for every compile that follows, jax's cache key does NOT capture this,
  and a torch-free process deserializing a torch-tainted entry hits the
  same cpu_aot_loader mismatch and can SIGSEGV (the r5 slow-suite crash).
  Processes therefore self-classify at enable() time — the CLI imports
  torch eagerly so its classification is stable for the process lifetime.
"""
import hashlib
import os
import platform
import sys


def _machine_key() -> str:
    """12-hex fingerprint of (arch, CPU model, CPU flags)."""
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                k = line.split(":")[0].strip()
                if k in ("model name", "flags") and k not in seen:
                    seen.add(k)
                    bits.append(line.strip())
                    if len(seen) == 2:
                        break
    except OSError:
        pass
    return hashlib.sha1("\n".join(bits).encode()).hexdigest()[:12]


def _taint_tag() -> str:
    """'tf' when torch/tensorflow native libs are loaded, else 'plain'.

    Must be evaluated after any eager torch import (cli/main.py does this
    first thing) so a process's compiles all land in one namespace."""
    return ("tf" if ("torch" in sys.modules or "tensorflow" in sys.modules)
            else "plain")


def _cache_dir() -> str:
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env is not None:
        return env                      # user override ("" disables)
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "drl_tetris_tpu_xla",
                        f"{_machine_key()}-{_taint_tag()}")


def enable_compilation_cache():
    """Activate the persistent compile cache on an already-imported jax.

    Call AFTER importing torch/tensorflow if the process will use them
    (see _taint_tag).  No-op when JAX_COMPILATION_CACHE_DIR="".
    """
    cache_dir = _cache_dir()
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Engine/finesse kernels take minutes; even mid-sized fns are worth
    # caching on this 2-vCPU box.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
