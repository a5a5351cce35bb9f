"""Smoke-run the demo gallery (reference: `demos/re/*`, `demos/cl/*`).

Each demo is executed as a real script (fresh interpreter, CPU forced) so
it is verified exactly as a user would run it.  The full sweep is slow on
a small CI box, so only the cheapest demo runs unconditionally; set
``NIFTY_TPU_RUN_DEMO_TESTS=1`` for the whole gallery.
"""

import os
import subprocess
import sys

import pytest

DEMOS_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "demos")

CHEAP = ["10_config_file.py", "0_intro.py", "5_wiener_filter.py"]
FULL = [
    "1_tomography.py",
    "2_sphere.py",
    "3_nuts.py",
    "4_multigrid_icr.py",
    "7_multifrequency.py",
    "8_density_estimator.py",
    "9_classification.py",
    "11_model_comparison.py",
    "12_parametric_vi.py",
    "13_varcov_regression.py",
]


def _run(name, fast=False, n_virtual_devices=None):
    env = dict(os.environ, NIFTY_TPU_DEMO_CPU="1")
    # demos import nifty_tpu from the repo root; make that work whether or
    # not the package is pip-installed in the interpreter's environment
    repo_root = os.path.abspath(os.path.join(DEMOS_DIR, os.pardir))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    if fast:
        env["NIFTY_TPU_DEMO_FAST"] = "1"
    if n_virtual_devices:
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_virtual_devices}"
        )
    r = subprocess.run(
        [sys.executable, os.path.join(DEMOS_DIR, name)],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
        cwd=os.path.join(DEMOS_DIR, os.pardir),
    )
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"


@pytest.mark.parametrize("name", CHEAP)
def test_demo_cheap(name):
    _run(name, fast=True)


def test_demo_field_sharded():
    """The flagship domain-decomposition demo, on a 4-device virtual CPU
    mesh (pencil FFT + psum reductions + sharded optimize_kl)."""
    _run("6_field_sharded.py", fast=True, n_virtual_devices=4)


@pytest.mark.skipif(
    os.environ.get("NIFTY_TPU_RUN_DEMO_TESTS", "0") != "1",
    reason="full demo sweep is slow; set NIFTY_TPU_RUN_DEMO_TESTS=1",
)
@pytest.mark.parametrize("name", FULL)
def test_demo_full(name):
    _run(name)
