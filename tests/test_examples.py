"""Examples smoke tests (the reference's main_test.go pattern)."""

import runpy

import pytest


def _run(name: str):
    runpy.run_path(f"examples/{name}.py", run_name="__main__")


def test_ckks_tutorial():
    _run("ckks_tutorial")


def test_ckks_template():
    _run("ckks_template")


def test_bgv_template():
    _run("bgv_template")


def test_bgv_vectorized_ole():
    _run("bgv_vectorized_ole")


def test_bgv_ride_hailing():
    _run("bgv_ride_hailing")


def test_ckks_scheme_switching():
    _run("ckks_scheme_switching")


def test_multiparty_pir():
    _run("multiparty_pir")


def test_multiparty_threshold_keygen():
    _run("multiparty_threshold_keygen")


def test_multiparty_psi():
    _run("multiparty_psi")


@pytest.mark.slow
def test_ckks_sigmoid_chebyshev():
    _run("ckks_sigmoid_chebyshev")


@pytest.mark.slow
def test_ckks_sigmoid_minimax():
    _run("ckks_sigmoid_minimax")


@pytest.mark.slow
def test_rgsw_blind_rotation():
    _run("rgsw_blind_rotation")
