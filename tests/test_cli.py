"""CLI surface tests, including the full prove->file->verify subprocess
round trip on the small1200 fixture (each subprocess recompiles its staged
jits, so this is one of the slower default tests)."""

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


def test_cli_help_and_errors():
    r = _run(["--help"])
    assert r.returncode == 0 and "prove" in r.stdout and "verify" in r.stdout
    r2 = _run(["prove"])           # missing circuit argument
    assert r2.returncode != 0
    r3 = _run(["bogus-subcommand"])
    assert r3.returncode != 0


def test_cli_prove_verify(tmp_path):
    proof = str(tmp_path / "p.npz")
    r = _run(["prove", "tests/data/small1200.pws", "-o", proof])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "proof written" in r.stdout
    r2 = _run(["verify", "tests/data/small1200.pws", proof])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Verification pass" in r2.stderr
    # reference-format fast/slow verify-time split (verifier.cpp:180)
    assert "(slow)" in r2.stdout
