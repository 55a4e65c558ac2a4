"""The polynomial-commitment seam.

The reference abstracts its PC behind compile-time F-macros with a
USE_VIRGO / USE_HYRAX_P224 switch (/root/reference/src/config_pc.hpp:8-21,
src/verifier.h:56-58) — the hyrax branch is uncompilable in its tree, but
the seam exists so a second commitment could plug in.  This is the runtime
equivalent: ``driver`` talks to the PC only through this interface, and
``VirgoPC`` (pc/virgo_pc.py + pc/vpd.py + pc/fft_gkr.py) is the one
implementation.

The protocol boundary follows the reference's call order
(src/verifier.cpp:137, 363-390):

1. ``commit_private`` before any challenge is drawn (the l-oracle commit,
   prover.cpp:524-530);
2. after the GKR walk reduces to one input-MLE claim at ``final_point``,
   ``open`` produces the opening proof fields (public commit, fft_gkr
   delegation, LDT folds, query answers — consuming the shared challenge
   stream exactly as the interactive protocol does);
3. ``verify_opening`` checks those fields against the commitment root and
   the surviving claim.
"""

from __future__ import annotations

import abc
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


class PolynomialCommitment(abc.ABC):
    """Commit/open/verify seam consumed by driver.py."""

    name: str = "abstract"

    @abc.abstractmethod
    def compile(self, bl0: int):
        """Per-input-size jitted pipelines (opaque to the driver)."""

    @abc.abstractmethod
    def commit_private(self, fns, inputs) -> Tuple[object, np.ndarray]:
        """Commit the witness; returns (prover state, root digest words)."""

    @abc.abstractmethod
    def open(self, fns, state, final_point, rng) -> Tuple[dict, int, dict]:
        """Produce the opening proof for the MLE claim at final_point.
        Returns (FullProof PC fields, pc proof size in bytes, flags)."""

    @abc.abstractmethod
    def verify_opening(self, fns, full, final_point, previous_sum,
                       rng) -> Tuple[bool, dict]:
        """Check an opening against the committed root and the claim
        value previous_sum.  Returns (ok, detail flags)."""


class VirgoPC(PolynomialCommitment):
    """The Virgo VPD + aggregated-FRI commitment (eprint 2019/1482)."""

    name = "virgo"

    def compile(self, bl0: int):
        from ..field import gf
        from ..gkr.beta import beta_table
        from ..pc import virgo_pc
        from ..pc.fft import ifft

        srec_lg = bl0 - virgo_pc.LOG_SLICE
        rou_small = gf.root_of_unity_int(srec_lg)

        def q_prepare(fp):
            """verifier-side q coefficients: beta table at the final point,
            per-slice IFFT (verifier.cpp:348-361)."""
            q_values = beta_table(fp, bl0, gf.ones(()))
            sl = q_values.reshape(2, virgo_pc.SLICES, 1 << srec_lg)
            coefs = jax.vmap(lambda v: ifft(v, rou_small),
                             in_axes=1, out_axes=1)(sl)
            return q_values, coefs

        return dict(
            bl0=bl0,
            commit=jax.jit(lambda v: virgo_pc.commit_private(v, bl0)),
            commit_pub=jax.jit(
                lambda l_eval, q: virgo_pc.commit_public(l_eval, q, bl0)),
            folds=jax.jit(
                lambda vo, rands: virgo_pc.commit_phase(vo, bl0,
                                                        list(rands))),
            q_prepare=jax.jit(q_prepare))

    def commit_private(self, fns, inputs):
        l_oracle, _ = fns["commit"](inputs)
        return l_oracle, np.asarray(l_oracle.tree[:, 1])

    def open(self, fns, l_oracle, final_point, rng):
        from ..field import gf
        from ..pc import virgo_pc, vpd, fft_gkr

        bl0 = fns["bl0"]
        q_values, _ = fns["q_prepare"](final_point)
        h_oracle, q_eval, q_coefs, all_sum, vo = fns["commit_pub"](
            l_oracle.codeword, q_values)

        fg = fft_gkr.run(bl0 - virgo_pc.LOG_SLICE, rng)

        n_folds = bl0 - virgo_pc.LOG_SLICE
        randomness = []
        for _ in range(n_folds):
            r, i = rng.field_element()
            randomness.append(gf.from_u64(np.uint64(r),
                                          np.uint64(i)).reshape(2))
        ldt = fns["folds"](vo, randomness)

        l_host = vpd.OracleHost.of(l_oracle)
        h_host = vpd.OracleHost.of(h_oracle)
        level_hosts = [vpd.OracleHost.of(o) for o in ldt.oracles]
        pows = vpd.draw_positions(rng, bl0)
        answers, query_size = vpd.answer_queries(pows, bl0, l_host, h_host,
                                                 level_hosts)
        level_roots = np.stack([np.asarray(h.tree[:, 1])
                                for h in level_hosts])
        fields = dict(
            root_h=np.asarray(h_oracle.tree[:, 1]),
            all_sum=np.asarray(all_sum),
            level_roots=level_roots,
            final_codeword=np.asarray(ldt.final_codeword),
            fft_gkr_messages=fg.messages,
            queries=answers)
        pc_proof_size = fg.proof_size + query_size + 2 * 32 + 16
        return fields, pc_proof_size, dict(fft_gkr_ok=fg.ok)

    def verify_opening(self, fns, full, final_point, previous_sum, rng):
        from ..field.ref import Fq2
        from ..pc import virgo_pc, vpd, fft_gkr

        bl0 = fns["bl0"]
        q_values, q_coefs = fns["q_prepare"](final_point)

        fg = fft_gkr.run(bl0 - virgo_pc.LOG_SLICE, rng,
                         replay=full.fft_gkr_messages)

        n_folds = bl0 - virgo_pc.LOG_SLICE
        rand_fq2 = []
        for _ in range(n_folds):
            r, i = rng.field_element()
            rand_fq2.append(Fq2.raw(r, i))

        pows = vpd.draw_positions(rng, bl0)
        all_sum_np = np.asarray(full.all_sum)
        all_sum_fq2 = [Fq2.raw(int(all_sum_np[0, k]), int(all_sum_np[1, k]))
                       for k in range(virgo_pc.SLICES + 1)]
        lroots = [full.level_roots[k].tobytes()
                  for k in range(full.level_roots.shape[0])]
        pc_ok = vpd.check_queries(
            pows, full.queries, bl0, rand_fq2, lroots, np.asarray(q_coefs),
            all_sum_fq2, np.asarray(full.root_l).tobytes(),
            np.asarray(full.root_h).tobytes(), full.final_codeword)

        # claimed inner product == GKR's surviving input claim; additionally
        # bind sum(all_sum) to it (driver docstring: our soundness fix)
        ps = Fq2.raw(int(np.asarray(previous_sum)[0]),
                     int(np.asarray(previous_sum)[1]))
        tot = Fq2.raw(0, 0)
        for x in all_sum_fq2:
            tot = tot + x
        input_check = (tot == ps)
        ok = bool(pc_ok) and fg.ok and input_check
        return ok, dict(fft_gkr_ok=fg.ok, input_check=input_check)


DEFAULT_PC = VirgoPC()
