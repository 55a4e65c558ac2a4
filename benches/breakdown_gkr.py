"""Stage-level timing of the GKR prover (SHA256_64) on the active backend:
phase-1/Liu inits (fused scatter), the batched fold scans per table size,
phase-2 inits, and the assemble step — the staged prover's own boundaries.

    python benches/breakdown_gkr.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def timed(name, fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    dt = (time.time() - t) / iters
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return out


def main():
    import jax
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from virgo_plus_tpu import driver
    from virgo_plus_tpu.circuits.compile import compile_circuit
    from virgo_plus_tpu.gkr import protocol
    import chutil

    chutil.ensure()
    c = driver.load_circuit("/root/reference/data/SHA256_64.pws")
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    ch, _rands, inputs = chutil.load_challenges()
    ev = protocol.make_evaluator(cc)
    values = ev(inputs)
    jax.block_until_ready(values)

    arrs = protocol.circuit_arrays(cc, plans)
    p1_groups = {}
    for i in range(cc.depth - 1, 0, -1):
        p1_groups.setdefault(cc.layers[i - 1].bit_length, []).append(i)

    inits_fn = jax.jit(
        lambda v, c_, a: protocol._prove_inits(cc, plans, v, c_, a))
    (vres, p1_stacked, liu_stacked) = timed("inits(p1+liu fused scatter)",
                                            inits_fn, values, ch, arrs)

    scan_fn = protocol._batched_scan_jit()
    p1_raw = {}
    for bl, a in sorted(p1_stacked.items()):
        p1_raw[bl] = timed(f"scan p1 bl={bl} x{a[0].shape[1]}", scan_fn, *a)
    for bl, a in sorted(liu_stacked.items()):
        timed(f"scan liu bl={bl} x{a[0].shape[1]}", scan_fn, *a)

    def _p2init(v, c_, p1r, a):
        claims = {}
        for bl, group in p1_groups.items():
            _, (vb, _a, _m) = p1r[bl]
            for kk, tag in enumerate(group):
                claims[tag] = vb[:, kk]
        return protocol._prove_p2_inits(cc, plans, v, c_, claims, a)

    p2_stacked = timed("p2 inits(fused scatter)", jax.jit(_p2init),
                       values, ch, p1_raw, arrs)
    for bl, a in sorted(p2_stacked.items()):
        timed(f"scan p2 bl={bl} x{a[0].shape[1]}", scan_fn, *a)

    # the merged-launch path bench (what prove() actually does): all p1+liu
    # jobs in [BUCKET_MIN_BL, BUCKET_MAX_BL] as ONE padded launch
    m_stacked = {}
    import jax.numpy as jnp
    for bl in sorted(set(p1_stacked) | set(liu_stacked)):
        parts = []
        if bl in p1_stacked:
            parts.append(p1_stacked[bl])
        if bl in liu_stacked:
            parts.append(liu_stacked[bl])
        m_stacked[bl] = tuple(
            jnp.concatenate([p[k] for p in parts], axis=1) for k in range(4))
    mg = {bl: ["x"] * m_stacked[bl][0].shape[1] for bl in m_stacked}
    merged_fn = jax.jit(
        lambda st, a: protocol._apply_grouped(st, mg, a))
    timed("merged p1+liu fold launch (as in fused prove)",
          merged_fn, m_stacked, arrs)


if __name__ == "__main__":
    main()
