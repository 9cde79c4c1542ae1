"""Examples smoke tests (the reference's main_test.go pattern).

Each example runs in its own subprocess: it isolates the suite from an
XLA-CPU compiler crash that manifests only late in a long-lived process
(hundreds of prior compilations), and mirrors how a user invokes the
example scripts.  The child forces the CPU backend the same way
tests/conftest.py does (the environment's sitecustomize overrides
JAX_PLATFORMS at interpreter start, so the config must be re-forced
after importing jax).
"""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(name: str):
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy; "
        f"runpy.run_path('examples/{name}.py', run_name='__main__')"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=_ROOT,
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, (
        f"example {name} failed (rc={r.returncode})\n"
        f"--- stdout ---\n{r.stdout[-2000:]}\n"
        f"--- stderr ---\n{r.stderr[-2000:]}")


@pytest.mark.slow
def test_ckks_tutorial():
    _run("ckks_tutorial")


def test_ckks_template():
    _run("ckks_template")


@pytest.mark.slow
def test_bgv_template():
    _run("bgv_template")


@pytest.mark.slow
def test_bgv_vectorized_ole():
    _run("bgv_vectorized_ole")


@pytest.mark.slow
def test_bgv_ride_hailing():
    _run("bgv_ride_hailing")


@pytest.mark.slow
def test_ckks_scheme_switching():
    _run("ckks_scheme_switching")


@pytest.mark.slow
def test_multiparty_pir():
    _run("multiparty_pir")


@pytest.mark.slow
def test_multiparty_threshold_keygen():
    _run("multiparty_threshold_keygen")


@pytest.mark.slow
def test_multiparty_psi():
    _run("multiparty_psi")


@pytest.mark.slow
@pytest.mark.slow
def test_ckks_sigmoid_chebyshev():
    _run("ckks_sigmoid_chebyshev")


@pytest.mark.slow
@pytest.mark.slow
def test_ckks_sigmoid_minimax():
    _run("ckks_sigmoid_minimax")


@pytest.mark.slow
@pytest.mark.slow
def test_rgsw_blind_rotation():
    _run("rgsw_blind_rotation")


@pytest.mark.slow
def test_ckks_bootstrapping():
    _run("ckks_bootstrapping")
