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
