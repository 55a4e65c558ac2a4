"""mesh + fs composition: the FS sharded prover (parallel/fs_sharded) on
the 8-device CPU mesh — proof bit-identical to the single-chip
driver.prove_fs and accepted by driver.verify_fs (default-on)."""

import numpy as np
import jax
from jax.sharding import Mesh

from virgo_plus_tpu import driver
from virgo_plus_tpu.circuits.layered import randomize, subset_init
from virgo_plus_tpu.config import ProtocolConfig
from virgo_plus_tpu.parallel.fs_sharded import prove_fs_sharded


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _circ(n_layers=4, bits=7, seed=5):
    c = randomize(n_layers, bits, seed=seed)
    subset_init(c)
    return c


def test_fs_sharded_bit_equal_and_verifies():
    """prove_fs_sharded == driver.prove_fs bit-for-bit (sponge streams
    identical: every absorb input matches, so every challenge matches),
    and the sharded FS proof verifies standalone through verify_fs."""
    c = _circ()
    cp = driver.compile_prover(c)
    ref, _ = driver.prove_fs(c, cp)
    got, info = prove_fs_sharded(c, _mesh(), "sp")

    assert np.array_equal(got.root_l, ref.root_l)
    assert np.array_equal(got.root_h, ref.root_h)
    assert np.array_equal(got.all_sum, ref.all_sum)
    assert np.array_equal(got.level_roots, ref.level_roots)
    assert np.array_equal(got.final_codeword, ref.final_codeword)
    assert np.array_equal(got.vres, ref.vres)
    for i in range(1, cp.cc.depth):
        for k, v in ref.layers[i].items():
            if v is None:
                continue
            assert np.array_equal(got.layers[i][k], v), (i, k)
    for a, b in zip(got.fft_gkr_messages, ref.fft_gkr_messages):
        assert np.array_equal(a, b)
    assert np.array_equal(got.queries.init_l_vals, ref.queries.init_l_vals)

    rep = driver.verify_fs(c, got, cp)
    assert rep.ok


def test_fs_sharded_rejects_tampering():
    """A tampered sharded FS proof must be rejected (the FS challenges
    re-derive from the messages, so any flip breaks a chain)."""
    c = _circ(3, 7, seed=11)
    cp = driver.compile_prover(c)
    full, _ = prove_fs_sharded(c, _mesh(), "sp")
    assert driver.verify_fs(c, full, cp).ok

    full.layers[1]["claim_u"] = (full.layers[1]["claim_u"] + 1) % (2**61 - 1)
    assert not driver.verify_fs(c, full, cp).ok


def test_run_config_mesh_fs():
    """ProtocolConfig(mesh=(1,8), transcript='fs') end-to-end through
    driver.run (the round-4 verdict's acceptance criterion)."""
    c = _circ(3, 7, seed=13)
    rep = driver.run(circuit=c,
                     config=ProtocolConfig(mesh=(1, 8), transcript="fs"))
    assert rep.ok
