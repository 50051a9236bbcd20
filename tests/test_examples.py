"""Examples must stay runnable (notebook-parity walkthroughs)."""

import runpy
import sys


def _run(path):
    argv = sys.argv
    sys.argv = [path]
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = argv


def test_quickstart(capsys):
    _run("examples/quickstart.py")
    assert "corrected OK" in capsys.readouterr().out


def test_noise_models(capsys):
    _run("examples/noise_models.py")
    out = capsys.readouterr().out
    assert "code capacity" in out and "space-time" in out
