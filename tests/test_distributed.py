"""Multi-PROCESS runtime test: the sharded classifier must produce
single-device-identical output when its mesh spans two OS processes
joined by jax.distributed (CPU backend, Gloo collectives) — the actual
multi-host code path (init_distributed, cross-process
make_array_from_callback, a2a over the distributed runtime), which the
in-process virtual mesh used by the rest of the suite cannot reach."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_sharded_classify():
    env = dict(os.environ)
    # the child processes manage their own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dist_smoke.py")],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "dist_smoke: OK" in r.stdout
