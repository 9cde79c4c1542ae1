"""Examples smoke tests (the reference's main_test.go pattern)."""

import runpy
import sys


def test_ckks_tutorial():
    runpy.run_path("examples/ckks_tutorial.py", run_name="__main__")


def test_multiparty_pir():
    runpy.run_path("examples/multiparty_pir.py", run_name="__main__")
