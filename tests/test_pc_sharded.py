"""Sharded commit == single-chip commit, bit for bit (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from virgo_plus_tpu.field import gf
from virgo_plus_tpu.pc import virgo_pc
from virgo_plus_tpu.parallel.pc_sharded import sharded_commit_private


def test_sharded_commit_root_matches():
    bl = 9
    rng = np.random.default_rng(3)
    values = gf.from_u64(rng.integers(0, gf.MOD, 1 << bl, dtype=np.uint64),
                         rng.integers(0, gf.MOD, 1 << bl, dtype=np.uint64))
    oracle, _ = jax.jit(lambda v: virgo_pc.commit_private(v, bl))(values)
    want_root = np.asarray(oracle.tree[:, 1])

    mesh = Mesh(np.array(jax.devices()[:8]), ("fp",))
    fn = jax.jit(sharded_commit_private(mesh, "fp", bl))
    root, cw_strided = fn(values)
    assert (np.asarray(root) == want_root).all()

    # strided codeword re-interleaves to the exact single-chip codeword
    cw = np.asarray(cw_strided)          # (2, 65, ss) with pos = j*S + q
    ss = cw.shape[2]
    S = 8
    full = np.asarray(oracle.codeword)
    # shard-major layout: global position p = j*S + q stored at
    # [q * (ss//S) + j] after shard_map concatenation
    re = np.zeros_like(cw)
    L = ss // S
    for q in range(S):
        for j in range(L):
            re[:, :, j * S + q] = cw[:, :, q * L + j]
    assert (re == full).all()
