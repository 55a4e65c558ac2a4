"""Per-kernel micro-benchmarks with speed-of-light accounting.

The BASELINE metric asks for "prover field-ops/s/chip" with per-kernel
speed-of-light accounting; the reference's analogue is
fieldElement::self_speed_test_{add,mult} (fieldElement.cpp:275-307).

Each kernel prints one JSON line with its measured throughput plus
`sol_pct`: achieved time vs the roofline max(compute, memory) time, where
the compute ceiling uses the kernel's analytic int32-ALU op count (the TPU
has no 64-bit multiplier; every u64 multiply lowers to 32-bit partial
products) and the memory ceiling uses bytes moved through HBM.

    python benches/micro.py            # runs on the active backend
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# single source for roofline + per-op costs: virgo_plus_tpu/utils/metrics.py
from virgo_plus_tpu.utils.metrics import (
    PEAK_INT32_OPS, HBM_BYTES_S, OPS_FIELD_MUL, OPS_FIELD_ADD, OPS_KECCAK)


def bench(name, fn, args, work, unit, ops=None, bytes_moved=0, iters=50):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t) / iters
    rec = {"kernel": name, "per_call_ms": round(dt * 1e3, 4),
           "throughput": round(work / dt / 1e9, 3), "unit": unit}
    if ops is not None and jax.default_backend() != "cpu":
        t_compute = ops / PEAK_INT32_OPS
        t_memory = bytes_moved / HBM_BYTES_S
        rec["sol_ms"] = round(max(t_compute, t_memory) * 1e3, 4)
        rec["sol_pct"] = round(100 * max(t_compute, t_memory) / dt, 1)
        rec["bound"] = "memory" if t_memory > t_compute else "compute"
    print(json.dumps(rec))


def main():
    import jax
    import jax.numpy as jnp
    from virgo_plus_tpu.field import gf
    from virgo_plus_tpu.gkr.sumcheck import scan_sumcheck, ScatterPlan
    from virgo_plus_tpu.pc.keccak import sha3_256_x64
    from virgo_plus_tpu.pc.fft import fft
    from virgo_plus_tpu.pc.virgo_pc import leaf_chain_hash

    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))
    rng = np.random.default_rng(0)
    n = 1 << 20

    def arr(m):
        return gf.from_u64(rng.integers(0, gf.MOD, m, dtype=np.uint64),
                           rng.integers(0, gf.MOD, m, dtype=np.uint64))

    a, b = arr(n), arr(n)

    @jax.jit
    def mul8(a, b):
        x = a
        for _ in range(8):
            x = gf.mul(x, b)
        return x

    bench("field_mul (chain of 8 on 2^20)", mul8, (a, b), 8 * n, "Gmul/s",
          ops=8 * n * OPS_FIELD_MUL, bytes_moved=3 * n * 16)

    @jax.jit
    def add8(a, b):
        x = a
        for _ in range(8):
            x = gf.add(x, b)
        return x

    bench("field_add (chain of 8 on 2^20)", add8, (a, b), 8 * n, "Gadd/s",
          ops=8 * n * OPS_FIELD_ADD, bytes_moved=3 * n * 16)

    bl = 16
    v, ad, m_ = arr(1 << bl), arr(1 << bl), arr(1 << bl)
    rs = arr(bl)
    # fold round on 2^k half-pairs: 10 field muls + ~12 adds per pair
    # (sumcheck.py body), summed over rounds of a geometric table
    fold_pairs = (1 << bl) - 1
    bench("sumcheck_full (2^16, 16 rounds)", jax.jit(scan_sumcheck),
          (v, ad, m_, rs), 13 * (1 << bl), "Gmul/s",
          ops=fold_pairs * (10 * OPS_FIELD_MUL + 12 * OPS_FIELD_ADD),
          bytes_moved=3 * (1 << bl) * 16 * 2)

    w = jnp.asarray(rng.integers(0, 2**63, (8, 1 << 14), dtype=np.uint64))
    bench("sha3_256 (2^14 msgs)", jax.jit(sha3_256_x64), (w,),
          1 << 14, "Ghash/s",
          ops=(1 << 14) * OPS_KECCAK, bytes_moved=(1 << 14) * (64 + 32))

    cw = arr(65 * (1 << 12)).reshape(2, 65, 1 << 12)
    bench("merkle_leaf_chain (65x2^12)", jax.jit(leaf_chain_hash), (cw,),
          65 * (1 << 11), "Ghash/s",
          ops=65 * (1 << 11) * OPS_KECCAK,
          bytes_moved=65 * (1 << 12) * 16 + (1 << 11) * 32)

    coef = arr(1 << 13)
    rou = gf.root_of_unity_int(18)
    # butterflies: order/2 per stage x lg(coef) stages; 1 mul + 2 add each
    n_bf = (1 << 18) * 13 // 2
    bench("fft (2^13 coef -> 2^18 evals)", jax.jit(lambda c: fft(c, 18, rou)),
          (coef,), n_bf, "Gbutterfly/s",
          ops=n_bf * (OPS_FIELD_MUL + 2 * OPS_FIELD_ADD),
          bytes_moved=(1 << 18) * 16 * 2 * 13)

    # phase-init scatter (segment sum): Hillis-Steele prefix = lg(N) passes
    nsc = 1 << 17
    idx = rng.integers(0, 1 << 16, nsc)
    plan = ScatterPlan.build(idx, 1 << 16)
    contrib = arr(nsc)
    parrs = plan.arrays()
    f_sc = jax.jit(lambda c_, a_: plan.apply(c_, a_))
    bench("scatter_segment_sum (2^17 -> 2^16)", f_sc, (contrib, parrs),
          nsc, "Gcontrib/s",
          ops=17 * nsc * OPS_FIELD_ADD,
          bytes_moved=17 * nsc * 16 * 2)


if __name__ == "__main__":
    main()
