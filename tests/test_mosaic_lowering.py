"""TPU (Mosaic) lowering of every Pallas kernel, verified WITHOUT a TPU.

``jax.export(platforms=["tpu"])`` runs the real Mosaic pipeline on any
host, so interpret-mode equivalence tests plus this lowering pin give
full no-device coverage of the kernels.  Round 3 caught three genuine
TPU-only bugs this way (erfc-unimplemented, two illegal block tilings)
— see ``tools/verify_mosaic.py``, which this test drives.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # ~2-3 min of Mosaic lowering

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("family",
                         ["attn", "ballquery", "chamfer", "denoise", "fp", "fps", "sa"])
def test_mosaic_lowering(family):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_mosaic.py"),
         "--only", family],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"{family}:\n{r.stdout}\n{r.stderr}"
