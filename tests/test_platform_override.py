"""DEPTHMAP_PLATFORM must pin the backend before any JAX init.

Accelerator plugins can prepend themselves to jax_platforms and ignore the
JAX_PLATFORMS environment variable (the tunnel plugin in this rig does),
so the package-level override is the only reliable off-accelerator switch.
Runs in a subprocess because the backend choice is a one-shot per process.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_platform_env_pins_cpu_backend():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["DEPTHMAP_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH"), REPO] if p)
    out = subprocess.run(
        [sys.executable, "-c",
         "import depthmap_tpu, jax; print(jax.default_backend())"],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"
