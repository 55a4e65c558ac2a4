"""SHA256_64 reference parity, machine-checked in-suite (opt-in marker).

Golden values re-pinned from the instrumented reference build in this
environment (.probe/ref_tree — verifier.cpp patched with a rolling
transcript hash over every prover message plus ROOT_L/ROOT_H dumps; the
same instrumentation reproduces tests/test_reference_parity.py's pinned
small1200 values exactly, validating the hashing scheme):

    TRANSCRIPT_HASH 1269658147760761179
    ROOT_L 16088143937895773112 15655709089726003103
           6403681522829828483 18189572807668870569
    ROOT_H 16152302802298481332 2778351065299657126
           16548347153488259203 8871638278774061863
    proof size 22.4375 kb / 100.375 kb

Run with:  python -m pytest tests/test_parity_sha256.py -m parity -q
"""

import pytest

from virgo_plus_tpu import driver
from tests.test_reference_parity import _transcript_hash

SHA_PWS = "/root/reference/data/SHA256_64.pws"
REF_TRANSCRIPT_HASH = 1269658147760761179
REF_ROOT_L = [16088143937895773112, 15655709089726003103,
              6403681522829828483, 18189572807668870569]
REF_ROOT_H = [16152302802298481332, 2778351065299657126,
              16548347153488259203, 8871638278774061863]
REF_GKR_KB = 22.4375
REF_PC_KB = 100.375


@pytest.mark.parity
def test_sha256_64_full_parity():
    c = driver.load_circuit(SHA_PWS)
    cp = driver.compile_prover(c)
    full, info = driver.prove(c, cp)
    rep = driver.verify(c, full, cp)
    assert rep.ok, rep
    assert _transcript_hash(cp.cc, full) == REF_TRANSCRIPT_HASH
    assert [int(x) for x in full.root_l] == REF_ROOT_L
    assert [int(x) for x in full.root_h] == REF_ROOT_H
    assert info["gkr_proof_size"] == int(REF_GKR_KB * 1024)
    assert info["pc_proof_size"] == int(REF_PC_KB * 1024)
