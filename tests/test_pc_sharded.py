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
    root, sub, top, cw_strided = fn(values)
    assert (np.asarray(root) == want_root).all()
    # top's last entry is the root (sharded_queries layout contract)
    assert (np.asarray(top)[:, -1] == want_root).all()

    # strided codeword re-interleaves to the exact single-chip codeword
    from virgo_plus_tpu.parallel.pc_sharded import unstride
    assert (unstride(cw_strided, 8) == np.asarray(oracle.codeword)).all()


def test_sharded_pc_prove_matches_single_chip():
    """Full sharded PC pipeline (private + public commit + every LDT fold)
    == the single-chip pipeline bit for bit on the 8-device CPU mesh."""
    from virgo_plus_tpu.parallel.pc_sharded import sharded_pc_prove, unstride

    bl = 9
    rng = np.random.default_rng(5)

    def rnd(n):
        return gf.from_u64(rng.integers(0, gf.MOD, n, dtype=np.uint64),
                           rng.integers(0, gf.MOD, n, dtype=np.uint64))

    values = rnd(1 << bl)
    q_values = rnd(1 << bl)
    n_folds = bl - virgo_pc.LOG_SLICE
    randomness = [rnd(1).reshape(2) for _ in range(n_folds)]

    # single-chip reference
    l_oracle, _ = jax.jit(lambda v: virgo_pc.commit_private(v, bl))(values)
    h_oracle, q_eval, q_coefs, all_sum, vo = jax.jit(
        lambda l, q: virgo_pc.commit_public(l, q, bl))(
            l_oracle.codeword, q_values)
    ldt = virgo_pc.commit_phase(vo, bl, randomness)

    mesh = Mesh(np.array(jax.devices()[:8]), ("fp",))
    fn = sharded_pc_prove(mesh, "fp", bl)
    out = fn(values, q_values, randomness)

    assert (np.asarray(out["root_l"]) == np.asarray(l_oracle.tree[:, 1])).all()
    assert (np.asarray(out["root_h"]) == np.asarray(h_oracle.tree[:, 1])).all()
    assert (np.asarray(out["all_sum"]) == np.asarray(all_sum)).all()
    assert (unstride(out["h_codeword"], 8)
            == np.asarray(h_oracle.codeword)).all()
    for k, o in enumerate(ldt.oracles):
        assert (np.asarray(out["level_roots"][k])
                == np.asarray(o.tree[:, 1])).all(), k
        assert (unstride(out["level_codewords"][k], 8)
                == np.asarray(o.codeword)).all(), k

    # query-sparse sharded answering == host answering, bit for bit
    from virgo_plus_tpu.parallel.pc_sharded import oracle_descs
    from virgo_plus_tpu.parallel.sharded_queries import (
        answer_queries_sharded)
    from virgo_plus_tpu.pc import vpd
    from virgo_plus_tpu.utils.glibc_rand import GlibcRandom

    pows = vpd.draw_positions(GlibcRandom(77), bl)
    l_host = vpd.OracleHost.of(l_oracle)
    h_host = vpd.OracleHost.of(h_oracle)
    level_hosts = [vpd.OracleHost.of(o) for o in ldt.oracles]
    want, want_size = vpd.answer_queries(pows, bl, l_host, h_host,
                                         level_hosts)

    lg = bl + virgo_pc.RATE - virgo_pc.LOG_SLICE
    l_d, h_d, lvl_d = oracle_descs(out, 8, lg)
    got, got_size = answer_queries_sharded(pows, bl, l_d, h_d, lvl_d)

    assert got_size == want_size
    assert (got.init_l_vals == want.init_l_vals).all()
    assert (got.init_l_paths == want.init_l_paths).all()
    assert (got.init_h_vals == want.init_h_vals).all()
    assert (got.init_h_paths == want.init_h_paths).all()
    for k in range(len(want.lvl_vals)):
        assert (got.lvl_vals[k] == want.lvl_vals[k]).all(), k
        assert (got.lvl_paths[k] == want.lvl_paths[k]).all(), k
