"""drl-tetris-tpu: a TPU-native rebuild of DRL-Tetris (see SURVEY.md).

Importing the package points JAX at a persistent XLA compilation cache
(~/.cache/drl_tetris_tpu_xla by default) so that separate processes —
trainer, league evals, bench, tests — reuse each other's compiles instead
of re-paying the multi-minute engine/finesse compilation.  The env var is
set with `setdefault` so users/CI can redirect or disable it
(JAX_COMPILATION_CACHE_DIR="" disables).
"""
import os

_CACHE_DIR = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "drl_tetris_tpu_xla"))


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
