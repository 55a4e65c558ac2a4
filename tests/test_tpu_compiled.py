"""Opt-in compiled-TPU bit-exactness (marker: tpu).

The suite pins itself to the CPU backend (conftest.py), so interpret-mode
Pallas tests can't certify the compiled kernels.  This test drives
tests/tpu_compiled_check.py in a clean subprocess on the axon TPU backend:
Pallas keccak == hashlib, Pallas sumcheck fold == XLA masked scan, and
(VPT_TPU_FULL=1) the fused SHA256_64 prover reproducing the pinned
reference-parity Merkle roots on the chip.

Run with:  VPT_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -m tpu -q
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("VPT_TPU_TESTS") != "1",
                    reason="needs the real TPU; set VPT_TPU_TESTS=1")
def test_pallas_kernels_compiled_on_tpu():
    here = os.path.dirname(os.path.abspath(__file__))
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = os.path.dirname(here)
    args = [sys.executable, os.path.join(here, "tpu_compiled_check.py")]
    if os.environ.get("VPT_TPU_FULL") == "1":
        args.append("--full")
    r = subprocess.run(args, capture_output=True, text=True, timeout=3600,
                       env=env)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "ALL OK" in r.stdout
