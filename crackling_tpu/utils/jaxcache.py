"""Persistent XLA compilation cache enablement.

The TPU engines' compiled programs are large (multi-hundred-program
pallas grids); a cold compile over the remote-TPU tunnel costs minutes.
Persisting compiled executables means only the first-ever run of a given
(program, shape) pays XLA. Every engine module and the bench call this
before building jitted functions; it is idempotent and silently a no-op
on jax builds without the config knobs.
"""

from __future__ import annotations

import os

_DONE = False


def enable_persistent_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    try:  # pragma: no cover - config availability depends on the jax build
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/crackling_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
