"""Mutation battery: every tampered region of a serialized proof must be
rejected (SURVEY.md §4c)."""

import numpy as np
import pytest

from virgo_plus_tpu import driver, proof_io
from virgo_plus_tpu.circuits.layered import randomize, subset_init

MOD = (1 << 61) - 1


@pytest.fixture(scope="module")
def setup():
    c = randomize(3, 7, seed=21)
    subset_init(c)
    cp = driver.compile_prover(c)
    full, info = driver.prove(c, cp)
    rep = driver.verify(c, full, cp)
    assert rep.ok
    return c, cp, full


def _reload(full):
    """round-trip through serialization to also cover proof_io"""
    import io
    buf = io.BytesIO()
    proof_io.save(buf, full)
    buf.seek(0)
    return proof_io.load(buf)


def test_serialization_roundtrip_verifies(setup):
    c, cp, full = setup
    full2 = _reload(full)
    assert driver.verify(c, full2, cp).ok


def test_reject_vres(setup):
    c, cp, full = setup
    f = _reload(full)
    f.vres = f.vres.copy()
    f.vres[0] = (int(f.vres[0]) + 1) % MOD
    assert not driver.verify(c, f, cp).ok


def test_reject_claim(setup):
    c, cp, full = setup
    f = _reload(full)
    lp = f.layers[c.size - 1]
    lp["claim_u"] = lp["claim_u"].copy()
    lp["claim_u"][0] = (int(lp["claim_u"][0]) + 1) % MOD
    assert not driver.verify(c, f, cp).ok


def test_reject_liu_claim(setup):
    c, cp, full = setup
    f = _reload(full)
    lp = f.layers[1]
    lp["liu_claim"] = lp["liu_claim"].copy()
    lp["liu_claim"][1] = (int(lp["liu_claim"][1]) + 1) % MOD
    assert not driver.verify(c, f, cp).ok


def test_reject_root_l(setup):
    c, cp, full = setup
    f = _reload(full)
    f.root_l = f.root_l.copy()
    f.root_l[0] ^= np.uint64(1)
    assert not driver.verify(c, f, cp).ok


def test_reject_query_value(setup):
    c, cp, full = setup
    f = _reload(full)
    f.queries.init_l_vals = f.queries.init_l_vals.copy()
    f.queries.init_l_vals[0, 3, 0, 0] ^= np.uint64(1)
    assert not driver.verify(c, f, cp).ok


def test_reject_merkle_path(setup):
    c, cp, full = setup
    f = _reload(full)
    f.queries.lvl_paths = [p.copy() for p in f.queries.lvl_paths]
    f.queries.lvl_paths[0][0, 0, 0] ^= np.uint64(1)
    assert not driver.verify(c, f, cp).ok


def test_reject_final_codeword(setup):
    c, cp, full = setup
    f = _reload(full)
    f.final_codeword = f.final_codeword.copy()
    f.final_codeword[0, 0, 0] = (int(f.final_codeword[0, 0, 0]) + 1) % MOD
    assert not driver.verify(c, f, cp).ok


def test_reject_forged_constant_final_codeword(setup):
    """The adversarial shape: an all-zeros codeword is constant per slice
    (so the constancy check alone passes) but is not the committed last
    fold level — the root binding must reject it."""
    c, cp, full = setup
    f = _reload(full)
    f.final_codeword = np.zeros_like(f.final_codeword)
    assert not driver.verify(c, f, cp).ok


def test_reject_forged_constant_final_codeword_shifted(setup):
    """A uniform per-slice shift keeps every constancy relation intact but
    changes the leaf chains; only the Merkle binding catches it."""
    c, cp, full = setup
    f = _reload(full)
    f.final_codeword = f.final_codeword.copy()
    f.final_codeword[0, 0] = (f.final_codeword[0, 0] + np.uint64(1)) \
        % np.uint64(MOD)
    assert not driver.verify(c, f, cp).ok


def test_reject_level_root(setup):
    c, cp, full = setup
    f = _reload(full)
    f.level_roots = f.level_roots.copy()
    f.level_roots[-1, 0] ^= np.uint64(1)
    assert not driver.verify(c, f, cp).ok


def test_reject_round_poly(setup):
    c, cp, full = setup
    f = _reload(full)
    lp = f.layers[1]
    lp["p1_polys"] = lp["p1_polys"].copy()
    lp["p1_polys"][0, 0, 1] = (int(lp["p1_polys"][0, 0, 1]) + 1) % MOD
    assert not driver.verify(c, f, cp).ok


def test_reject_claims_v(setup):
    c, cp, full = setup
    f = _reload(full)
    for i in range(1, c.size):
        lp = f.layers[i]
        if lp.get("claims_v") is not None and lp["claims_v"].size:
            lp["claims_v"] = lp["claims_v"].copy()
            lp["claims_v"][0, 0] = (int(lp["claims_v"][0, 0]) + 1) % MOD
            break
    else:
        import pytest
        pytest.skip("no layer with claims_v")
    assert not driver.verify(c, f, cp).ok


def test_reject_all_sum(setup):
    c, cp, full = setup
    f = _reload(full)
    f.all_sum = f.all_sum.copy()
    f.all_sum[0, 0] = (int(f.all_sum[0, 0]) + 1) % MOD
    assert not driver.verify(c, f, cp).ok


def test_reject_root_h(setup):
    c, cp, full = setup
    f = _reload(full)
    f.root_h = f.root_h.copy()
    f.root_h[0] ^= np.uint64(1)
    assert not driver.verify(c, f, cp).ok


def test_reject_level_query_value(setup):
    c, cp, full = setup
    f = _reload(full)
    f.queries.lvl_vals = [v.copy() for v in f.queries.lvl_vals]
    f.queries.lvl_vals[0][0, 2, 0, 0] ^= np.uint64(1)
    assert not driver.verify(c, f, cp).ok


def test_reject_fft_gkr_message(setup):
    c, cp, full = setup
    f = _reload(full)
    f.fft_gkr_messages = [m.copy() for m in f.fft_gkr_messages]
    m = f.fft_gkr_messages[2]
    m.flat[0] = (int(m.flat[0]) + 1) % MOD
    assert not driver.verify(c, f, cp).ok
