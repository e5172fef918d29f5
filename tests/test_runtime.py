"""Runtime rails: the accelerator liveness probe (utils/runtime.py).

Motivation (failure-detection, SURVEY.md §5.3): on the remote-TPU tunnel a
wedged backend makes `jax.devices()` block forever with zero CPU — observed
twice during agent-selection campaigns.  The probe runs in a subprocess with
a hard timeout so CLIs abort with a message instead of hanging silently.
"""

import subprocess

from drone2d_tpu.utils import runtime


def test_probe_succeeds_on_cpu():
    # Pin the child to the CPU backend via jax.config (the env-var route is
    # overridden by this image's site hook — see wait_for_accelerator).
    assert runtime.wait_for_accelerator(
        timeout_s=120.0, retries=1, platform="cpu"
    )


def test_probe_gives_up_after_retries(monkeypatch):
    calls = []

    def fake_run(*a, **kw):
        calls.append(a)
        raise subprocess.TimeoutExpired(cmd="probe", timeout=kw["timeout"])

    monkeypatch.setattr(runtime.subprocess, "run", fake_run)
    assert not runtime.wait_for_accelerator(
        timeout_s=0.1, retries=3, retry_wait_s=0.0
    )
    assert len(calls) == 3


def test_probe_platform_from_env(monkeypatch):
    # DRONE2D_PLATFORM=cpu must reach the probe child (CPU fallback mode).
    monkeypatch.setenv("DRONE2D_PLATFORM", "cpu")
    assert runtime.wait_for_accelerator(timeout_s=120.0, retries=1)


def test_probe_reports_nonzero_exit(monkeypatch):
    class R:
        returncode = 1
        stderr = b"RuntimeError: Unable to initialize backend 'axon'"

    monkeypatch.setattr(runtime.subprocess, "run", lambda *a, **kw: R())
    assert not runtime.wait_for_accelerator(
        timeout_s=0.1, retries=2, retry_wait_s=0.0
    )
