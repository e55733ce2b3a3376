"""Subprocess plumbing for the interpret-mode kernel tests.

The children are compile-heavy XLA:CPU jobs that can run for hours cold.
Three rules (round-4 advisor findings):

- stdout/stderr go to unnamed temp files, never PIPE: XLA writes
  slow_operation_alarm chatter to stderr, and a child whose ~64 KiB pipe
  buffer fills blocks mid-write while the parent is draining a sibling —
  silently re-serializing runs meant to be concurrent.
- every kill is followed by a reap (wait) so no zombie with open fds
  lingers in the pytest process.
- join() waits on the process only; output is read back from the files
  after exit.
"""
import json
import os
import pathlib
import subprocess
import sys
import tempfile

_REPO = pathlib.Path(__file__).resolve().parent.parent


def spawn(child_src: str, env_extra: dict) -> subprocess.Popen:
    env = dict(os.environ, **env_extra)
    env.pop("JAX_PLATFORMS", None)
    out_f = tempfile.TemporaryFile(mode="w+")
    err_f = tempfile.TemporaryFile(mode="w+")
    proc = subprocess.Popen([sys.executable, "-c", child_src], cwd=_REPO,
                            env=env, stdout=out_f, stderr=err_f, text=True)
    proc.ug_out, proc.ug_err = out_f, err_f
    return proc


def reap(proc: subprocess.Popen) -> None:
    """Kill if still running, then wait: no zombies, fds closed."""
    if proc.poll() is None:
        proc.kill()
        proc.wait()
    proc.ug_out.close()
    proc.ug_err.close()


def join(proc: subprocess.Popen, timeout: float = 14000) -> dict:
    """Wait for the child and parse the last stdout line as JSON."""
    try:
        proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        reap(proc)
        raise
    proc.ug_out.seek(0)
    proc.ug_err.seek(0)
    out = proc.ug_out.read()
    err = proc.ug_err.read()
    assert proc.returncode == 0, err[-3000:]
    return json.loads(out.strip().splitlines()[-1])
