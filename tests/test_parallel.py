"""Sharded sumcheck == single-chip sumcheck on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from virgo_plus_tpu.field import gf
from virgo_plus_tpu.gkr.sumcheck import scan_sumcheck
from virgo_plus_tpu.parallel.sharded import sharded_sumcheck


def _rand_tables(rng, bl):
    n = 1 << bl
    def r():
        return gf.from_u64(rng.integers(0, gf.MOD, n, dtype=np.uint64),
                           rng.integers(0, gf.MOD, n, dtype=np.uint64))
    return r(), r(), r()


def test_sharded_sumcheck_matches():
    rng = np.random.default_rng(5)
    bl = 9
    v, a, m = _rand_tables(rng, bl)
    rs = gf.from_u64(rng.integers(0, gf.MOD, bl, dtype=np.uint64),
                     rng.integers(0, gf.MOD, bl, dtype=np.uint64))
    ref_polys, (rv, ra, rm) = jax.jit(scan_sumcheck)(v, a, m, rs)

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("sp",))
    fn = jax.jit(sharded_sumcheck(mesh, "sp"))
    got_polys, (gv, ga, gm) = fn(v, a, m, rs)
    assert bool(jnp.all(got_polys == ref_polys))
    assert bool(jnp.all(gv == rv))
