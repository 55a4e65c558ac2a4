"""Multi-chip sharding for the protocol arrays (SURVEY.md §5.7-5.8).

The reference is single-threaded AVX2 (fieldElement.cpp:370-494); there is
no distributed anything to port.  The TPU-native design introduces:

* **sp (sumcheck/sequence parallel)**: the 2^k sumcheck tables shard over
  the *leading* hypercube variables (high index bits), so the round fold —
  which pairs (2i, 2i+1), i.e. the LOW bit — stays shard-local.  Each round
  emits a partial quadratic; a tiny psum over 'sp' produces the message.
  After k - log(S) rounds each shard holds one element; the log(S)-round
  tail is finished replicated after an all_gather (the halving-reduce
  schedule, the zk analogue of ring attention).

* **dp (data parallel)**: independent proof instances batched on a leading
  axis and sharded across 'dp' — the serving axis for fleets of proofs.

Both ride jax.sharding.Mesh + shard_map; ICI within a slice, DCN across
hosts, reached through the same named-axis collectives.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..field import gf
from ..gkr.sumcheck import tree_sum, scan_sumcheck


def sharded_sumcheck(mesh: Mesh, axis: str):
    """Returns fn(v, a, m, rs) -> (polys (bl,2,3), bound (v,a,m)) computing
    the same sumcheck as gkr.sumcheck.scan_sumcheck, with tables sharded
    over `axis` (leading hypercube variables)."""

    def local_rounds(v, a, m, rs_local):
        """First k - log S rounds: fold locally, emit PARTIAL poly sums."""
        return scan_sumcheck(v, a, m, rs_local)

    def fn(v, a, m, rs):
        n = v.shape[1]
        bl = rs.shape[1]
        assert n == 1 << bl
        s = mesh.shape[axis]
        log_s = s.bit_length() - 1
        assert 1 << log_s == s
        local_bl = bl - log_s

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(None, axis), P(None, axis), P(None, axis),
                           P(None, None)),
                 out_specs=(P(None, None, None),
                            (P(None), P(None), P(None))),
                 check_vma=False)
        def _run(v, a, m, rs):
            # Local phase: each shard runs local_bl rounds over its block.
            # Shard q holds indices [q*2^local_bl, (q+1)*2^local_bl): the
            # LOW local_bl variables are entirely local.
            polys_l, (vb, ab, mb) = scan_sumcheck(v, a, m, rs[:, :local_bl])
            # partial round polys -> full messages.  psum adds raw u64
            # lanes; S <= 8 canonical terms stay < 2^64, then one Mersenne
            # fold restores canonical form.  (For S > 16 switch to a staged
            # reduction.)
            polys_l = gf.reduce_lazy(jax.lax.psum(polys_l, axis))
            # Tail: gather the per-shard bound scalars into a 2^log_s table
            # and finish replicated (tiny work).  all_gather stacks the
            # shard axis first: (S, 2) -> (2, S), shard order == high bits.
            vt = jnp.moveaxis(jax.lax.all_gather(vb, axis), 0, 1)
            at = jnp.moveaxis(jax.lax.all_gather(ab, axis), 0, 1)
            mt = jnp.moveaxis(jax.lax.all_gather(mb, axis), 0, 1)
            polys_t, (vf, af, mf) = scan_sumcheck(vt, at, mt,
                                                  rs[:, local_bl:])
            polys = jnp.concatenate([polys_l, polys_t], axis=0)
            return polys, (vf, af, mf)

        return _run(v, a, m, rs)

    return fn


def make_batched_prover(cc, plans, mesh: Mesh, dp_axis: str = "dp"):
    """Data-parallel proving: a batch of witnesses sharded over `dp_axis`;
    each device proves its instances with the single-chip kernels (no
    cross-instance communication exists in the protocol)."""
    from ..gkr import protocol
    from ..circuits.compile import evaluate

    def one(inputs, ch):
        values = evaluate(cc, inputs)
        return protocol.prove(cc, plans, values, ch)

    batched = jax.vmap(one, in_axes=(0, None))

    def fn(inputs_batch, ch):
        spec = jax.sharding.NamedSharding(mesh, P(dp_axis, None, None))
        inputs_batch = jax.device_put(inputs_batch, spec)
        return batched(inputs_batch, ch)

    return jax.jit(fn)


def make_batched_full_prover(cc, plans, mesh: Mesh = None,
                             dp_axis: str = "dp"):
    """Batched FULL proving — GKR plus the complete polynomial commitment
    (private commit, public commit, every LDT fold) vmapped over the
    witness batch (BASELINE config #3: 64..1024 instances).

    Returns run(inputs_batch (B, 2, N), ch, final_point, fold_rands) ->
    (proofs, root_l (B,4), root_h (B,4), all_sum (B,2,65),
     level_roots (B, L, 4), final_codewords (B,2,65,2^RATE)) as four
    staged jits (each compiles in seconds and is shared across batch
    sizes via vmap).  With a mesh, the batch shards over `dp_axis` —
    instances are independent, so scaling is embarrassingly parallel and
    the per-chip rate is the single-chip rate."""
    from ..gkr import protocol
    from ..gkr.beta import beta_table
    from ..circuits.compile import evaluate
    from ..pc import virgo_pc

    bl0 = cc.layers[0].bit_length
    arrs = protocol.circuit_arrays(cc, plans)

    def gkr_one(inputs, ch, arrs):
        values = evaluate(cc, inputs)
        return protocol.prove(cc, plans, values, ch, arrs)

    gkr_fn = jax.jit(jax.vmap(gkr_one, in_axes=(0, None, None)))

    def commit_one(inputs):
        oracle, _ = virgo_pc.commit_private(inputs, bl0)
        return oracle.codeword, oracle.tree[:, 1]

    commit_fn = jax.jit(jax.vmap(commit_one))

    def public_one(l_codeword, q_values):
        h_oracle, _qe, _qc, all_sum, vo = virgo_pc.commit_public(
            l_codeword, q_values, bl0)
        return h_oracle.tree[:, 1], all_sum, vo

    public_fn = jax.jit(jax.vmap(public_one, in_axes=(0, None)))

    def folds_one(vo, rands):
        ldt = virgo_pc.commit_phase(vo, bl0, list(rands))
        roots = jnp.stack([o.tree[:, 1] for o in ldt.oracles])
        return roots, ldt.final_codeword

    folds_fn = jax.jit(jax.vmap(folds_one, in_axes=(0, None)))

    q_fn = jax.jit(lambda fp: beta_table(fp, bl0, gf.ones(())))

    def run(inputs_batch, ch, final_point, fold_rands):
        if mesh is not None:
            spec = jax.sharding.NamedSharding(mesh, P(dp_axis, None, None))
            inputs_batch = jax.device_put(inputs_batch, spec)
        proofs = gkr_fn(inputs_batch, ch, arrs)
        l_cw, root_l = commit_fn(inputs_batch)
        q_values = q_fn(final_point)
        root_h, all_sum, vo = public_fn(l_cw, q_values)
        level_roots, final_cw = folds_fn(vo, tuple(fold_rands))
        return proofs, root_l, root_h, all_sum, level_roots, final_cw

    return run
