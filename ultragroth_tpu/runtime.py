"""Process-level JAX runtime configuration shared by every entry point
(api, cli, server, embedded C ABI).

- persistent XLA compilation cache (first prover compile on a fresh machine
  is minutes; cached reruns are milliseconds) - dir from
  ULTRAGROTH_COMPILE_CACHE, default ~/.cache/ultragroth_tpu/xla;
- optional platform override via ULTRAGROTH_PLATFORM=cpu|tpu (needed by
  embedded consumers that cannot call jax.config themselves).
"""
from __future__ import annotations

import os
import pathlib

_CONFIGURED = False


def configure() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True
    import jax

    plat = os.environ.get("ULTRAGROTH_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    cache = os.environ.get("ULTRAGROTH_COMPILE_CACHE")
    if cache != "off":
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "unknown"
        path = pathlib.Path(cache) if cache else (
            pathlib.Path.home() / ".cache" / "ultragroth_tpu"
            / f"xla-{backend}")
        try:
            path.mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", str(path))
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        except Exception:
            pass
