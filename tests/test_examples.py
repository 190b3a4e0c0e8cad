"""The example scripts are executable documentation (the analog of the
reference's vignettes running under R CMD check, SURVEY.md §4): run them
end to end so they cannot rot."""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name, timeout=600):
    # the site plugin ignores JAX_PLATFORMS at interpreter start, so force
    # CPU via jax.config before the script initialises a backend
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy, sys; "
        f"sys.argv = [{name!r}]; "
        f"runpy.run_path({os.path.join(_ROOT, 'examples', name)!r}, "
        "run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, cwd=_ROOT,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    return out.stdout


@pytest.mark.slow
def test_quickstart_example_runs():
    stdout = _run_example("quickstart.py")
    assert "cells" in stdout


@pytest.mark.slow
def test_pbmc_example_runs():
    stdout = _run_example("pbmc_integration.py")
    assert stdout.strip()


@pytest.mark.slow
def test_large_scale_example_runs():
    stdout = _run_example("large_scale.py")
    assert "integrated" in stdout and "phase walls" in stdout
