"""u32 limb-plane field == u64-plane field (the Pallas path parity)."""

import numpy as np
import jax

from virgo_plus_tpu.field import gf, gf_u32


def _batch(seed, n=513):
    rng = np.random.default_rng(seed)
    return gf.from_u64(rng.integers(0, gf.MOD, n, dtype=np.uint64),
                       rng.integers(0, gf.MOD, n, dtype=np.uint64))


def test_u32_roundtrip():
    a = _batch(0)
    back = gf_u32.to_u64_planes(gf_u32.from_u64_planes(a))
    assert bool((np.asarray(back) == np.asarray(a)).all())


def test_u32_ops_match_u64():
    a, b = _batch(1), _batch(2)
    a4, b4 = gf_u32.from_u64_planes(a), gf_u32.from_u64_planes(b)
    for op64, op32 in ((gf.add, gf_u32.add), (gf.sub, gf_u32.sub),
                      (gf.mul, gf_u32.mul)):
        want = np.asarray(op64(a, b))
        got = np.asarray(gf_u32.to_u64_planes(jax.jit(op32)(a4, b4)))
        assert (want == got).all(), op64.__name__
