"""Persistent XLA compilation cache (off with MVS_TPU_NO_COMPILE_CACHE=1).

The CLIs run as independent array-job processes — without this every shard
job re-pays the (remote, tens-of-seconds) TPU compiles for the same program
shapes. Imported by the jax-using modules (ops.pairwise, ops.projection,
ann.flat_index) so pure-host entry points (codecs, legacy readers, query
outputs) never pay the jax import or the mkdir.
"""

from __future__ import annotations

import os

_done = False


def ensure() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("MVS_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            cache = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(os.path.expanduser("~"), ".cache",
                             "mvs_tpu_xla_cache"))
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
