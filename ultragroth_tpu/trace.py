"""In-prover phase timers (reference parity: the MSM1-5 / FFT wall-time
prints of /root/reference/src/ultra_groth.cpp:199-239,321-335 and
groth16.cpp's phase logs).

Enable with ULTRAGROTH_TRACE=1 (prints one line per phase to stderr) or
programmatically via Tracer(enabled=True).  Timings are relay-safe: each
mark forces a tiny host readback of the phase output (block_until_ready
does not truly sync through the axon relay), which serializes the phases -
so tracing is strictly opt-in and the default path keeps JAX's async
dispatch.

The last prove's per-phase milliseconds are kept on the prover as
`last_phase_ms` for bench.py / server metrics.
"""
from __future__ import annotations

import contextlib
import os
import sys
import time


def _env_enabled() -> bool:
    return os.environ.get("ULTRAGROTH_TRACE", "") not in ("", "0", "off")


def _profile_dir() -> str | None:
    """ULTRAGROTH_PROFILE=<dir>: capture a jax.profiler trace of each
    prove into <dir> (open with xprof/tensorboard).  This is the SURVEY
    section 5 "TPU equivalent" of the reference's wall-clock prints:
    named phase annotations + the full XLA op timeline."""
    d = os.environ.get("ULTRAGROTH_PROFILE", "")
    return d if d not in ("", "0", "off") else None


def annotate(name: str):
    """Host-side xprof annotation around one prover phase.  A no-op
    nullcontext unless profiling is on — TraceAnnotation never touches
    the jaxpr, so toggling it cannot invalidate compile caches."""
    if _profile_dir() is None:
        return contextlib.nullcontext()
    import jax.profiler
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile_session(label: str):
    """jax.profiler.trace around a whole prove when ULTRAGROTH_PROFILE is
    set; otherwise free."""
    d = _profile_dir()
    if d is None:
        yield
        return
    import jax.profiler
    with jax.profiler.trace(os.path.join(d, label)):
        yield


def _sync(value) -> None:
    """Force completion of `value` with a host readback of a tiny slice."""
    import jax
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(value):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
            return
    # host-only values: nothing to sync


class ProveAborted(RuntimeError):
    """Raised between prover phases when an abort_check fires (the
    cooperative in-flight cancellation behind the server's /cancel;
    the reference only consults its flag before the prove starts,
    fullprover.cpp:137-202)."""


class Tracer:
    """Named phase marks around the prover pipeline.

    with tracer.phase("msm_a") as p: p.out = pi_a
    or the lighter tracer.mark("msm_a", pi_a) between pipeline steps.

    abort_check: optional callable polled at every mark; when it returns
    True the mark raises ProveAborted.  Polling syncs the phase output
    first (serializing the phases like tracing does), so it is opt-in —
    the default prove keeps JAX's async dispatch.
    """

    def __init__(self, enabled: bool | None = None, label: str = "prove",
                 abort_check=None):
        self.enabled = _env_enabled() if enabled is None else enabled
        self.label = label
        self.abort_check = abort_check
        self.phase_ms: dict[str, float] = {}
        self._t0 = time.perf_counter() if self.enabled else 0.0

    def run(self, name: str, fn):
        """Run one phase: fn() under an xprof annotation (when profiling),
        then mark(name, result).  Returns fn()'s result."""
        with annotate(f"{self.label}:{name}"):
            out = fn()
        self.mark(name, out)
        return out

    def mark(self, name: str, value=None) -> None:
        """Record time since the previous mark; syncs on `value` first."""
        if self.abort_check is not None:
            if value is not None:
                _sync(value)
            if self.abort_check():
                raise ProveAborted(f"aborted during {self.label}:{name}")
        if not self.enabled:
            return
        if value is not None:
            _sync(value)
        now = time.perf_counter()
        ms = (now - self._t0) * 1e3
        self.phase_ms[name] = self.phase_ms.get(name, 0.0) + ms
        self._t0 = now
        print(f"[ultragroth-tpu] {self.label} {name}: {ms:.1f} ms",
              file=sys.stderr, flush=True)

    def total_ms(self) -> float:
        return sum(self.phase_ms.values())

    def report(self) -> dict[str, float]:
        if self.enabled:
            print(f"[ultragroth-tpu] {self.label} total: "
                  f"{self.total_ms():.1f} ms", file=sys.stderr, flush=True)
        return self.phase_ms
