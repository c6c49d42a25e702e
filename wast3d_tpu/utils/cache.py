"""Persistent XLA compilation cache helper.

TPU (remote) compiles in this environment cost 20-60s per program; the
persistent cache makes second runs near-instant. Called by the CLI
drivers, bench, and the graft entry."""

import os


def enable(path: str = None) -> None:
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get("WAST3D_JAX_CACHE",
                                   os.path.join(os.path.dirname(os.path.dirname(
                                       os.path.dirname(os.path.abspath(__file__)))),
                                       ".jax_cache")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
