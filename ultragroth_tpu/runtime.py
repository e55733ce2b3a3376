"""Process-level JAX runtime configuration shared by every entry point
(api, cli, server, embedded C ABI).

- persistent XLA compilation cache (first prover compile on a fresh machine
  is minutes; cached reruns are milliseconds) - dir from
  ULTRAGROTH_COMPILE_CACHE, default ~/.cache/ultragroth_tpu/xla;
- optional platform override via ULTRAGROTH_PLATFORM=cpu|tpu (needed by
  embedded consumers that cannot call jax.config themselves);
- multi-host bootstrap: when ULTRAGROTH_COORDINATOR is set,
  jax.distributed.initialize is called before any backend touch
  (parallel/mesh.py), so every entry point can drive a pod slice.
"""
from __future__ import annotations

import os
import pathlib

_CONFIGURED = False


def ensure_map_count(min_maps: int = 1 << 20) -> None:
    """Best-effort raise of vm.max_map_count.

    XLA:CPU's LLVM JIT allocates several mappings per compiled
    executable; compile-heavy processes (full test suite, the multichip
    dryrun, cold proves) exceed the 65530 default within minutes and die
    with 'LLVM compilation error: Cannot allocate memory' followed by a
    segfault — the crash that took down every round-2 full-suite run.
    Raising the knob needs root; failures are silently ignored (the
    per-file test runner keeps map counts bounded as the fallback)."""
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            cur = int(f.read().strip())
        if cur < min_maps:
            with open(path, "w") as f:
                f.write(str(min_maps))
    except Exception:
        pass


def host_fingerprint() -> str:
    """Short fingerprint of this host's CPU feature set.

    XLA:CPU persistent-cache entries embed AOT executables pinned to the
    COMPILE machine's CPU features; loading them on a host with a
    different feature set errors ('cpu_aot_loader ... doesn't match the
    machine type for execution') or SIGILLs the process — observed
    killing the round-4/5 interpret-mode test children after the build
    moved boxes with the repo's .jax_cache intact.  Scoping the CPU
    cache dir by this fingerprint makes stale cross-machine entries
    unreachable instead of fatal."""
    import hashlib
    import platform
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except Exception:
        pass
    h = hashlib.sha256((platform.machine() + "|" + flags).encode())
    return h.hexdigest()[:12]


def cpu_cache_dir(root) -> str:
    """Machine-scoped XLA:CPU compilation-cache dir under `root`."""
    path = pathlib.Path(root) / f"host-{host_fingerprint()}"
    path.mkdir(parents=True, exist_ok=True)
    return str(path)


def configure() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True
    ensure_map_count()
    import jax

    plat = os.environ.get("ULTRAGROTH_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    # multi-host runtime (no-op unless ULTRAGROTH_COORDINATOR is set);
    # must run before the first backend query
    from .parallel.mesh import distributed_init
    distributed_init()

    cache = os.environ.get("ULTRAGROTH_COMPILE_CACHE")
    if cache != "off":
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "unknown"
        path = pathlib.Path(cache) if cache else (
            pathlib.Path.home() / ".cache" / "ultragroth_tpu"
            / f"xla-{backend}")
        if backend == "cpu" and not cache:
            # CPU AOT executables are machine-pinned (host_fingerprint)
            path = path / f"host-{host_fingerprint()}"
        try:
            path.mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", str(path))
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        except Exception:
            pass
