"""Execution tests for the shipped examples.

The reference's only runnable smoke test is its example notebook
(reference README.md:24-26, ips_example.ipynb); SURVEY.md §4 calls for
doing better — these tests actually execute both of our examples so the
documented minimal API cannot rot silently.

Both run in subprocesses/kernels pinned to CPU: the build image's
sitecustomize (on PYTHONPATH) registers a remote TPU backend in every
python process, so the child env drops it and sets JAX_PLATFORMS=cpu.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # repo importable, image sitecustomize dropped
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no 8-device mesh for the examples
    return env


@pytest.mark.slow
def test_minimal_ips_example_runs():
    """examples/minimal_ips.py end-to-end (few steps, CPU)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "minimal_ips.py"),
         "--steps", "8", "--cpu"],
        capture_output=True, text=True, env=_cpu_env(), cwd=REPO,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "selected patch indices for sample 0:" in proc.stdout
    assert "loss" in proc.stdout


@pytest.mark.slow
def test_example_notebook_executes():
    """examples/ips_example.ipynb executes start to finish.

    STEPS is dialed down from 60 to 8 before execution (iteration count
    only — every cell still runs verbatim otherwise).
    """
    nbformat = pytest.importorskip("nbformat")
    nbclient = pytest.importorskip("nbclient")

    nb = nbformat.read(os.path.join(REPO, "examples", "ips_example.ipynb"),
                       as_version=4)
    patched = False
    for cell in nb.cells:
        if cell.cell_type == "code" and "STEPS = 60" in cell.source:
            cell.source = cell.source.replace("STEPS = 60", "STEPS = 8")
            patched = True
    assert patched, "notebook no longer defines STEPS = 60"

    client = nbclient.NotebookClient(
        nb, timeout=900, kernel_name="python3",
        resources={"metadata": {"path": REPO}})
    client.execute(env=_cpu_env())  # forwarded to KernelManager.start_kernel

    # the selection cell must have printed the chosen indices
    tail = nb.cells[-1]
    outputs = "".join(o.get("text", "") for o in tail.get("outputs", []))
    assert "selected patch indices for sample 0:" in outputs
