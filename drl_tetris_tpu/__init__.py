"""drl-tetris-tpu: a TPU-native rebuild of DRL-Tetris (see SURVEY.md).

Importing the package points JAX at a persistent XLA compilation cache
(~/.cache/drl_tetris_tpu_xla/<machine-key> by default) so that separate
processes — trainer, league evals, bench, tests — reuse each other's
compiles instead of re-paying the multi-minute engine/finesse compilation.
The env var is set with `setdefault` so users/CI can redirect or disable it
(JAX_COMPILATION_CACHE_DIR="" disables).

The cache directory is keyed by a fingerprint of this machine's CPU model
and feature flags: XLA:CPU serializes AOT executables specialized to the
compiling host's CPU features, and loading such an executable on a host
with a different feature set can SIGILL/segfault (XLA warns
"Machine type used for XLA:CPU compilation doesn't match the machine type
for execution", cpu_aot_loader).  A per-machine-type subdirectory makes
cross-machine reuse structurally impossible while keeping same-machine
reuse (the case that matters) intact.
"""
import hashlib
import os
import platform


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


_CACHE_DIR = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "drl_tetris_tpu_xla",
                 _machine_key()))


def enable_compilation_cache():
    """Activate the persistent compile cache on an already-imported jax.

    The env var above covers the common case (package imported before
    jax reads its config); this covers the rest (jax imported first, e.g.
    by a notebook or the test harness).  No-op when the cache is disabled.
    """
    if not _CACHE_DIR:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    # Engine/finesse kernels take minutes; even mid-sized fns are worth
    # caching on this 2-vCPU box.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
