"""Sub-stage timing of _prove_inits / _prove_p2_inits (SHA256_64):
beta-table builds, contribution gathers+muls, the fused segment-sum
scatter, and the job stacking — each as its own jit.

    python benches/breakdown_inits.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    import jax.numpy as jnp
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from virgo_plus_tpu import driver
    from virgo_plus_tpu.circuits.compile import compile_circuit
    from virgo_plus_tpu.gkr import protocol
    from virgo_plus_tpu.gkr.sumcheck import apply_scatter_arrays, prefix_sum
    from virgo_plus_tpu.field import gf
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

    depth = cc.depth
    one = gf.ones(())

    # replicate the beta_jobs of _prove_inits
    def beta_jobs_of(ch):
        beta_jobs = {}
        for i in range(depth - 1, 0, -1):
            L = cc.layers[i]
            P = plans[i]
            chl = ch.layers[i]
            bl_prev = cc.layers[i - 1].bit_length
            r_cur = (ch.r_out if i == depth - 1
                     else ch.layers[i + 1].r_liu[:, :L.bit_length])
            beta_jobs[("bg", i)] = (r_cur, L.bit_length, one)
            sig = chl.sig
            beta_jobs[("bsig", i)] = (chl.r_u, bl_prev, sig[:, 0])
            if P.liu_plan is not None:
                for (j, ds, bl_jl, off) in P.liu_consumers:
                    beta_jobs[("bt", i, j)] = (ch.layers[j].r_v, bl_jl,
                                               sig[:, j - i + 1])
        return beta_jobs

    jobs = beta_jobs_of(ch)
    print(json.dumps({"n_beta_tables": len(jobs),
                      "total_beta_entries": sum(1 << bl
                                                for (_r, bl, _i) in
                                                jobs.values())}), flush=True)
    betas = timed("batched_betas", jax.jit(
        lambda c_: protocol._batched_betas(beta_jobs_of(c_))), ch)

    blocks = protocol._inits_layout(cc, plans)

    def contribs_of(values, ch, betas, arrs):
        contribs = {}
        for i in range(depth - 1, 0, -1):
            L = cc.layers[i]
            P = plans[i]
            chl = ch.layers[i]
            bg_full = protocol._scale_beta_asserts(cc, i, betas[("bg", i)],
                                                   chl.assert_r)
            bg = bg_full[:, :L.size]
            y = values[:, arrs[f"y{i}"]]
            co = arrs[f"co{i}"]
            A, B, C, D = co[0], co[1], co[2], co[3]
            contribs[("add", i)] = gf.mul(bg, gf.add(gf.mul(B, y), D))
            contribs[("mult", i)] = gf.mul(bg, gf.add(A, gf.mul(C, y)))
            if P.liu_plan is not None:
                parts = [betas[("bt", i, j)][:, :ds]
                         for (j, ds, bl_jl, off) in P.liu_consumers]
                contribs[("liu", i)] = jnp.concatenate(parts, axis=1)
        return jnp.concatenate([contribs[(k, i)] for (k, i, _n, _o)
                                in blocks], axis=1)

    cat = timed("contribs(gather+mul+concat)", jax.jit(contribs_of),
                values, ch, betas, arrs)
    print(json.dumps({"n_contrib": int(cat.shape[1])}), flush=True)

    timed("fused_scatter(prefix-sum)", jax.jit(
        lambda c_, a_: apply_scatter_arrays(c_, a_)), cat, arrs["initsP"])

    # prefix sum alone vs the gather part
    perm = arrs["initsP"][0]
    g = timed("scatter: perm gather", jax.jit(lambda c_, p: c_[:, p]),
              cat, perm)
    timed("scatter: prefix_sum only", jax.jit(prefix_sum), g)

    # the two boundary gathers
    s0 = jnp.pad(g, ((0, 0), (1, 0)))
    timed("scatter: boundary gathers", jax.jit(
        lambda s_, a_: gf.sub(s_[:, a_[2]], s_[:, a_[1]])), s0,
        arrs["initsP"])

    # full inits for comparison
    timed("[whole _prove_inits]", jax.jit(
        lambda v, c_, a: protocol._prove_inits(cc, plans, v, c_, a)),
        values, ch, arrs)


if __name__ == "__main__":
    main()
