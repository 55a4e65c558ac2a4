"""CLI surface: prove -> file -> verify round trip."""

import os
import subprocess
import sys


def _run(args, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable, "-m", "virgo_plus_tpu"] + args,
                          capture_output=True, text=True, env=env,
                          cwd=os.path.dirname(os.path.dirname(__file__)),
                          **kw)


def test_cli_prove_verify(tmp_path):
    proof = str(tmp_path / "p.npz")
    r = _run(["prove", "tests/data/small1200.pws", "-o", proof])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "proof written" in r.stdout
    r2 = _run(["verify", "tests/data/small1200.pws", proof])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Verification pass" in r2.stderr
