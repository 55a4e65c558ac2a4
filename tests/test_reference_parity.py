"""Bit-exact reference parity on a committed fixture circuit.

Expected values pinned from the instrumented reference build
(.probe/verifier_dump.cpp — see memory/virgo-repo-verification-recipes):
transcript hash over every GKR round poly + claim, both PC Merkle roots,
and both proof sizes.  SHA256_64 parity (same pipeline, larger shapes) is
exercised out-of-band: hash 1269658147760761179, 22.4375/100.375 KB.
"""

import numpy as np

from virgo_plus_tpu import driver

FIXTURE = "tests/data/small1200.pws"
REF_TRANSCRIPT_HASH = 6734251442166396890
REF_ROOT_L = [4549031888097254546, 11168658884316476171,
              16120839039200765914, 5241882187682402051]
REF_ROOT_H = [13909950205968780032, 16010536814451885176,
              13358162157050512808, 7962201919850548760]
REF_GKR_KB = 8.71875
REF_PC_KB = 75.21875

M64 = 2 ** 64


def _transcript_hash(cc, full):
    h = 146527

    def add(el):
        nonlocal h
        h = (h * 1000003 + int(el[0])) % M64
        h = (h * 1000003 + int(el[1])) % M64

    def poly(p):
        for k in range(3):
            add(p[:, k])

    add(full.vres)
    for i in range(cc.depth - 1, 0, -1):
        lp = full.layers[i]
        for j in range(lp["p1_polys"].shape[0]):
            poly(lp["p1_polys"][j])
        add(lp["claim_u"])
        if lp.get("p2_polys") is not None:
            for j in range(lp["p2_polys"].shape[0]):
                poly(lp["p2_polys"][j])
            for k in range(lp["claims_v"].shape[0]):
                add(lp["claims_v"][k])
        for j in range(lp["liu_polys"].shape[0]):
            poly(lp["liu_polys"][j])
        add(lp["liu_claim"])
    return h


def test_full_reference_parity():
    c = driver.load_circuit(FIXTURE)
    cp = driver.compile_prover(c)
    full, info = driver.prove(c, cp)
    rep = driver.verify(c, full, cp)
    assert rep.ok, rep
    assert _transcript_hash(cp.cc, full) == REF_TRANSCRIPT_HASH
    assert [int(x) for x in full.root_l] == REF_ROOT_L
    assert [int(x) for x in full.root_h] == REF_ROOT_H
    assert info["gkr_proof_size"] == int(REF_GKR_KB * 1024)
    assert info["pc_proof_size"] == int(REF_PC_KB * 1024)
