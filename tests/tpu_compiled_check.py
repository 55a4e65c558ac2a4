"""Compiled-TPU bit-exactness checks (run in a clean process on the axon
backend — tests/conftest.py pins the suite itself to CPU, so the opt-in
test in test_tpu_compiled.py drives this script in a subprocess).

Checks, all COMPILED on the real chip (not interpret mode):
  1. Pallas SHA3-256 kernel == hashlib on sub-tile and multi-block widths.
  2. Pallas fused sumcheck-fold kernel == the masked-scan XLA path.
  3. (--full) fused SHA256_64 prover roots == the pinned reference-parity
     values (the -m parity golden, proven on the TPU itself).

Exit code 0 iff every check passes.
"""

import hashlib
import sys

import numpy as np


def main(full=False):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu", (
        "this script must run on the TPU backend")

    from virgo_plus_tpu.field import gf
    from virgo_plus_tpu.gkr.sumcheck import scan_sumcheck_batched
    from virgo_plus_tpu.pallas_kernels.sumcheck_fold import (
        scan_sumcheck_batched_pallas)
    from virgo_plus_tpu.pc.keccak import sha3_256_x64_xla
    from virgo_plus_tpu.pallas_kernels.keccak_chain import sha3_256_x64_pallas

    rng = np.random.default_rng(17)

    # 1. keccak kernel compiled == hashlib
    for n in (5, 1500):
        words = jnp.asarray(rng.integers(0, 2**63, (8, n), dtype=np.uint64))
        got = np.asarray(jax.jit(sha3_256_x64_pallas)(words))
        ref = np.asarray(jax.jit(sha3_256_x64_xla)(words))
        assert np.array_equal(got, ref), f"keccak pallas != xla at n={n}"
        w_np = np.asarray(words)
        for col in (0, n - 1):
            msg = b"".join(int(w_np[k, col]).to_bytes(8, "little")
                           for k in range(8))
            want = hashlib.sha3_256(msg).digest()
            got_b = b"".join(int(x).to_bytes(8, "little")
                             for x in got[:, col])
            assert got_b == want, f"keccak != hashlib at n={n} col={col}"
    print("keccak compiled: ok", flush=True)

    # 2. fold kernel compiled == masked-scan XLA
    def mk(shape):
        return jnp.asarray(
            rng.integers(0, gf.MOD, size=(2,) + shape, dtype=np.uint64))

    for bl, k in [(7, 3), (9, 2), (13, 1)]:
        n = 1 << bl
        v, a, m = mk((k, n)), mk((k, n)), mk((k, n))
        rs = mk((k, bl))
        p0, (v0, a0, m0) = jax.jit(scan_sumcheck_batched)(v, a, m, rs)
        p1, (v1, a1, m1) = scan_sumcheck_batched_pallas(v, a, m, rs)
        for x, y in [(p0, p1), (v0, v1), (a0, a1), (m0, m1)]:
            assert np.array_equal(np.asarray(x), np.asarray(y)), (bl, k)
    print("sumcheck fold compiled: ok", flush=True)

    if full:
        # 3. fused prover on the chip reproduces the pinned parity roots
        sys.path.insert(0, "/root/repo/benches")
        import chutil
        from virgo_plus_tpu import driver, fused
        from virgo_plus_tpu.circuits.compile import compile_circuit
        from virgo_plus_tpu.gkr import protocol
        from virgo_plus_tpu.pc import virgo_pc
        from tests.test_parity_sha256 import REF_ROOT_L, REF_ROOT_H

        c = driver.load_circuit("/root/reference/data/SHA256_64.pws")
        cc = compile_circuit(c)
        plans = protocol.build_plans(cc)
        chutil.ensure(cc=cc,
                      n_folds=cc.layers[0].bit_length - virgo_pc.LOG_SLICE)
        ch, randomness, inputs = chutil.load_challenges()
        run = fused.make_e2e_prover(cc, plans)
        _proof, l_oracle, h_oracle, *_rest = run(inputs, ch, randomness)
        assert [int(x) for x in np.asarray(l_oracle.tree[:, 1])] == \
            REF_ROOT_L, "ROOT_L mismatch on TPU"
        assert [int(x) for x in np.asarray(h_oracle.tree[:, 1])] == \
            REF_ROOT_H, "ROOT_H mismatch on TPU"
        print("fused prover parity roots on TPU: ok", flush=True)

    print("ALL OK", flush=True)


if __name__ == "__main__":
    main(full="--full" in sys.argv)
