"""Pallas fused sumcheck fold == XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from virgo_plus_tpu.field import gf
from virgo_plus_tpu.gkr.sumcheck import scan_sumcheck_batched
from virgo_plus_tpu.pallas_kernels import sumcheck_fold
from virgo_plus_tpu.pallas_kernels.sumcheck_fold import (
    scan_sumcheck_batched_pallas)


def _mk(rng, shape):
    return jnp.asarray(
        rng.integers(0, gf.MOD, size=(2,) + shape, dtype=np.uint64))


def test_sumcheck_fold_pallas_matches_masked_scan():
    """The fused fold kernel (production TPU path) must be bit-identical to
    the masked-prefix scan across table sizes, incl. the sublane->lane tail
    transition and the K-table grid."""
    rng = np.random.default_rng(7)
    for bl, k in [(7, 3), (9, 2)]:
        n = 1 << bl
        v, a, m = _mk(rng, (k, n)), _mk(rng, (k, n)), _mk(rng, (k, n))
        rs = _mk(rng, (k, bl))
        p0, (v0, a0, m0) = scan_sumcheck_batched(v, a, m, rs)
        p1, (v1, a1, m1) = scan_sumcheck_batched_pallas(v, a, m, rs,
                                                        interpret=True)
        for x, y in [(p0, p1), (v0, v1), (a0, a1), (m0, m1)]:
            assert np.array_equal(np.asarray(x), np.asarray(y)), (bl, k)


def test_sumcheck_fold_pallas_prereduce_branch(monkeypatch):
    """The _prereduce path (digit-column overflow guard, only reached at
    bl=17 in production) must stay bit-exact; exercised at a small size by
    lowering MAX_DIGIT_COUNT so round 0 exceeds it."""
    monkeypatch.setattr(sumcheck_fold, "MAX_DIGIT_COUNT", 1 << 7)
    sumcheck_fold._fold_call.cache_clear()
    try:
        rng = np.random.default_rng(11)
        bl, k = 10, 2
        n = 1 << bl
        v, a, m = _mk(rng, (k, n)), _mk(rng, (k, n)), _mk(rng, (k, n))
        rs = _mk(rng, (k, bl))
        p0, (v0, a0, m0) = scan_sumcheck_batched(v, a, m, rs)
        p1, (v1, a1, m1) = scan_sumcheck_batched_pallas(v, a, m, rs,
                                                        interpret=True)
        for x, y in [(p0, p1), (v0, v1), (a0, a1), (m0, m1)]:
            assert np.array_equal(np.asarray(x), np.asarray(y))
    finally:
        sumcheck_fold._fold_call.cache_clear()


def test_keccak_kernel_math_matches_xla_and_hashlib():
    """The Pallas SHA3 kernel's u32-pair math (keccak_chain._keccak_f with
    the _kernel absorb/pad layout) == XLA keccak == hashlib.

    The kernel body is pure jnp, so it runs directly on arrays here — the
    generic pallas interpreter leaks unboundedly on this kernel (OOM after
    ~30 min even at one block), so the pallas *plumbing* (BlockSpecs, grid,
    padding wrapper) is certified compiled-on-chip by the opt-in
    tests/test_tpu_compiled.py instead."""
    import hashlib
    from virgo_plus_tpu.pc.keccak import sha3_256_x64_xla
    from virgo_plus_tpu.pallas_kernels import keccak_chain

    rng = np.random.default_rng(13)
    n = 1500
    words = jnp.asarray(rng.integers(0, 2**63, (8, n), dtype=np.uint64))

    def kernel_math(w):
        """_kernel's absorb/pad/permute/squeeze on plain (8, n) u64 words
        (mirrors keccak_chain._kernel without refs/tiles)."""
        lo = (w & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (w >> jnp.uint64(32)).astype(jnp.uint32)
        zero = jnp.zeros_like(lo[0])
        st = [(zero, zero) for _ in range(25)]
        for k in range(8):
            st[k] = (lo[k], hi[k])
        st[8] = (jnp.full_like(zero, np.uint32(0x06)), zero)
        st[16] = (zero, jnp.full_like(zero, np.uint32(0x80000000)))
        st = keccak_chain._keccak_f(st)
        return jnp.stack(
            [st[k][0].astype(jnp.uint64) |
             (st[k][1].astype(jnp.uint64) << jnp.uint64(32))
             for k in range(4)])

    import jax
    ref = np.asarray(jax.jit(sha3_256_x64_xla)(words))
    # eager on purpose: jitting the unrolled 24-round DAG chokes the CPU
    # XLA scheduler (the same reason pc/keccak.py keeps a scan on CPU)
    got = np.asarray(kernel_math(words))
    assert np.array_equal(ref, got)
    # spot-check vs hashlib
    w_np = np.asarray(words)
    for col in (0, n - 1):
        msg = b"".join(int(w_np[k, col]).to_bytes(8, "little")
                       for k in range(8))
        want = hashlib.sha3_256(msg).digest()
        got_b = b"".join(int(x).to_bytes(8, "little") for x in ref[:, col])
        assert got_b == want
