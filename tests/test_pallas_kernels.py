"""Pallas field kernels == XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from virgo_plus_tpu.field import gf, gf_u32
from virgo_plus_tpu.pallas_kernels import fold_bind_pallas


def test_fold_bind_matches_xla():
    rng = np.random.default_rng(4)
    n = 512

    def mk(m):
        return gf.from_u64(rng.integers(0, gf.MOD, m, dtype=np.uint64),
                           rng.integers(0, gf.MOD, m, dtype=np.uint64))

    v0 = gf_u32.from_u64_planes(mk(n))
    v1 = gf_u32.from_u64_planes(mk(n))
    r = gf_u32.from_u64_planes(mk(1))
    want = gf_u32.add(v0, gf_u32.mul(gf_u32.sub(v1, v0),
                                     jnp.broadcast_to(r.reshape(4, 1),
                                                      (4, n))))
    got = fold_bind_pallas(v0, v1, r, interpret=True)
    assert bool((np.asarray(got) == np.asarray(want)).all())


def test_sumcheck_fold_pallas_matches_masked_scan():
    """The fused fold kernel (production TPU path) must be bit-identical to
    the masked-prefix scan across table sizes, incl. the sublane->lane tail
    transition and the K-table grid."""
    from virgo_plus_tpu.gkr.sumcheck import scan_sumcheck_batched
    from virgo_plus_tpu.pallas_kernels.sumcheck_fold import (
        scan_sumcheck_batched_pallas)

    rng = np.random.default_rng(7)
    for bl, k in [(7, 3), (9, 2)]:
        n = 1 << bl

        def mk(shape):
            return jnp.asarray(
                rng.integers(0, gf.MOD, size=(2,) + shape, dtype=np.uint64))

        v, a, m = mk((k, n)), mk((k, n)), mk((k, n))
        rs = mk((k, bl))
        p0, (v0, a0, m0) = scan_sumcheck_batched(v, a, m, rs)
        p1, (v1, a1, m1) = scan_sumcheck_batched_pallas(v, a, m, rs,
                                                        interpret=True)
        for x, y in [(p0, p1), (v0, v1), (a0, a1), (m0, m1)]:
            assert np.array_equal(np.asarray(x), np.asarray(y)), (bl, k)
