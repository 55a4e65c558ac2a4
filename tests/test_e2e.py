"""Full prove+verify (GKR + VPD) on synthetic circuits."""

import numpy as np

from virgo_plus_tpu import driver
from virgo_plus_tpu.circuits.layered import randomize, subset_init


def _circ(n_layers=3, bits=7, seed=2):
    c = randomize(n_layers, bits, seed=seed)
    subset_init(c)
    return c


def test_e2e_accepts():
    rep = driver.run(circuit=_circ())
    assert rep.gkr_ok and rep.pc_ok and rep.ok
    assert rep.details["input_check"]
    assert rep.details["fft_gkr_ok"]


def test_e2e_rejects_bad_witness():
    """A proof made from a tampered witness must be REJECTED against the
    honest circuit's claimed public outputs (checked via output_values —
    the verifier folds the claimed output block and compares to vres)."""
    c = _circ()
    cp = driver.compile_prover(c)
    cc = cp.cc

    # honest public outputs: evaluate the honest witness, take the output
    # layer block
    from virgo_plus_tpu.circuits.compile import input_buffer
    values = cp.evaluator(input_buffer(cc))
    off = int(cc.value_off[cc.depth - 1])
    outputs = np.asarray(values[:, off:off + cc.layers[cc.depth - 1].padded])

    # honest proof accepts against the claimed outputs
    full, _ = driver.prove(c, cp)
    rep = driver.verify(c, full, cp, output_values=outputs)
    assert rep.ok

    # tampered witness: prove honestly over the WRONG witness, then claim
    # the honest outputs — the output-MLE binding must reject
    bad = np.asarray(c.input_values).copy()
    bad[0, 0] = (int(bad[0, 0]) + 1) % ((1 << 61) - 1)
    full_bad, _ = driver.prove(c, cp, witness=bad)
    rep_bad = driver.verify(c, full_bad, cp, output_values=outputs)
    assert not rep_bad.gkr_ok and not rep_bad.ok
