"""Persistent XLA compilation cache helper.

TPU (remote) compiles in this environment cost 20-60s per program; the
persistent cache makes second runs near-instant. Called by the CLI
drivers, bench, and the graft entry."""

import os


def enable(path: str = None) -> None:
    try:
        import jax

        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        # CPU runs get NO persistent cache, ever — not even a private
        # temp dir: deserializing a foreign-host CPU entry ABORTS the
        # process (machine-feature mismatch, e.g. 'prefer-no-scatter'),
        # and SERIALIZING a CPU executable segfaults outright on this
        # host generation (observed under the test harness). CPU
        # compiles are seconds; the cache exists for the 30-300s TPU
        # tunnel compiles.
        # WAST3D_NO_CACHE: authoritative opt-out (e.g. quality_gate
        # --no-cache A/B compile-time measurements) — module-level
        # enable() calls in drivers must not silently re-enable.
        if os.environ.get("WAST3D_NO_CACHE"):
            return
        if os.environ.get("WAST3D_FORCE_CPU"):
            return
        if os.environ.get("JAX_PLATFORMS", "").strip().lower().startswith(
                "cpu"):
            return
        path = path or os.environ.get("WAST3D_JAX_CACHE")
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.path.join(repo, ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
