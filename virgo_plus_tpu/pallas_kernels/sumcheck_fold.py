"""Fused Pallas TPU kernel for the batched sumcheck fold.

The GKR prover's hot loop (reference: sumcheckUpdateEach,
/root/reference/src/prover.cpp:457-492) folds three bookkeeping tables in
half per round and emits a degree-2 polynomial.  The XLA formulations pay
either ~100x for minor-axis stride-2 slicing (masked scan) or a huge
unrolled module (bit-reversed fold).  This kernel runs the WHOLE phase for
one table in one VMEM-resident program:

  * tables live as 4x-uint32 limb planes (field/gf_u32.py) shaped
    (4, S, 128) — sublanes x lanes; Mosaic has no 64-bit integers;
  * inputs are in BIT-REVERSED order, so every round is two contiguous
    half-splits along the sublane axis (no strided access, no masks) until
    the table fits one 128-lane row, after which a lane roll + mask
    finishes the tail;
  * the per-round coefficient sums are computed EXACTLY by summing 16-bit
    digit planes (u32 column sums cannot overflow for counts <= 2^15; a
    field-add pre-reduction enforces that) down to 128-lane partials; the
    host-side postlude finishes the lane sum in u64 and recombines digits
    mod p via 61-bit Mersenne rotations (2^(16d) mod (2^61-1) is a
    rotation), so results are bit-identical to the reference's sequential
    field additions (unique canonical representatives).

The public entry scan_sumcheck_batched_pallas matches scan_sumcheck_batched
(sumcheck.py) in signature and bit-exact outputs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import gf, gf_u32

U16 = np.uint32(0xFFFF)
LANES = 128
# digit column sums stay < 2^31 when at most 2^15 summands
MAX_DIGIT_COUNT = 1 << 15


def _digit_rows(x, mask=None):
    """x: (4, S, L) canonical field limb planes -> list of 8 (L,) u32
    sublane-summed digit partials, ordered [comp][digit]."""
    rows = []
    for comp in range(2):
        lo, hi = x[2 * comp], x[2 * comp + 1]
        for d in (lo & U16, lo >> 16, hi & U16, hi >> 16):
            if mask is not None:
                d = jnp.where(mask, d, jnp.uint32(0))
            # Mosaic lacks unsigned reductions; digits < 2^16 and column
            # sums < 2^31, so a signed i32 sum is exact.
            rows.append(jnp.sum(d.astype(jnp.int32), axis=0,
                                dtype=jnp.int32).astype(jnp.uint32))
    return rows


def _prereduce(x, count):
    """Pairwise field-add halves (exact) until count <= MAX_DIGIT_COUNT."""
    while count > MAX_DIGIT_COUNT:
        s = x.shape[1]
        x = gf_u32.add(x[:, : s // 2], x[:, s // 2:])
        count //= 2
    return x


def _make_kernel(bl: int, n: int):
    def kernel(v_ref, a_ref, m_ref, rs_ref, polys_ref, bound_ref):
        cv = v_ref[:, 0]
        ca = a_ref[:, 0]
        cm = m_ref[:, 0]
        for j in range(bl):
            cur = n >> j
            half = cur // 2
            rj = rs_ref[:, 0, j][:, None, :]     # (4, 1, L)
            if cur > LANES:
                sh = half // LANES
                v0, v1 = cv[:, :sh], cv[:, sh:2 * sh]
                a0, a1 = ca[:, :sh], ca[:, sh:2 * sh]
                m0, m1 = cm[:, :sh], cm[:, sh:2 * sh]
                mask = None
            else:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                mask = lane < half
                v0, a0, m0 = cv, ca, cm
                # cyclic left-shift by half (roll takes non-negative i32
                # shifts; a bare python int traces as i64 under x64)
                sh32 = np.int32(LANES - half)
                v1 = pltpu.roll(cv, sh32, 2)
                a1 = pltpu.roll(ca, sh32, 2)
                m1 = pltpu.roll(cm, sh32, 2)
            dv = gf_u32.sub(v1, v0)
            da = gf_u32.sub(a1, a0)
            dm = gf_u32.sub(m1, m0)
            pa = gf_u32.mul(dm, dv)
            pb = gf_u32.add(gf_u32.add(gf_u32.mul(dm, v0),
                                       gf_u32.mul(m0, dv)), da)
            pc = gf_u32.add(gf_u32.mul(m0, v0), a0)
            rows = []
            for coef in (pa, pb, pc):
                rows.extend(_digit_rows(_prereduce(coef, half), mask))
            polys_ref[0, j] = jnp.stack(rows)     # (24, L)
            cv = gf_u32.add(v0, gf_u32.mul(dv, rj))
            ca = gf_u32.add(a0, gf_u32.mul(da, rj))
            cm = gf_u32.add(m0, gf_u32.mul(dm, rj))
        bound_ref[:, 0, 0] = cv[:, 0, :]
        bound_ref[:, 0, 1] = ca[:, 0, :]
        bound_ref[:, 0, 2] = cm[:, 0, :]

    return kernel


@functools.lru_cache(maxsize=None)
def _fold_call(bl: int, k: int, interpret: bool):
    n = 1 << bl
    s = max(n // LANES, 1)
    kernel = _make_kernel(bl, n)
    # index-map constants must be i32 (python ints trace as i64 under x64);
    # the K (table) axis sits in dim 1 of the inputs so the host-side
    # prologue is reshape-only (a (4,K,N)->(K,4,N) transpose costs ~2.5ms
    # per group on TPU — measured — while index-map selection is free)
    z = np.int32(0)
    dim1 = lambda k_: (z, k_, z, z)
    dim0 = lambda k_: (k_, z, z, z)
    return pl.pallas_call(
        kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((4, 1, s, LANES), dim1, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, s, LANES), dim1, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, s, LANES), dim1, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, bl, LANES), dim1, memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((k, bl, 24, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, k, 3, LANES), jnp.uint32),
        ),
        out_specs=(
            pl.BlockSpec((1, bl, 24, LANES), dim0, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, 3, LANES), dim1, memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            # round-0 temporaries of a 2^17-entry table exceed the 16MB
            # default scoped-vmem budget; v5e has headroom above it
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


_MOD = np.uint64(gf.MOD)


def _recombine_polys(partials):
    """(K, bl, 24, L) u32 digit partials -> (bl, K, 2, 3) u64 canonical.

    value = sum_d rot61(S_d, 16*d) mod p  — multiplying by 2^(16d) modulo
    the Mersenne prime is a 61-bit rotation, so recombination is shifts and
    modular adds (exact)."""
    s = jnp.sum(partials.astype(jnp.uint64), axis=3)   # (K, bl, 24) < 2^39
    kk, bl = s.shape[0], s.shape[1]
    s = s.reshape(kk, bl, 3, 2, 4)
    acc = None
    for d in range(4):
        sd = s[..., d]
        sh = 16 * d
        low = sd & ((np.uint64(1) << np.uint64(61 - sh)) - np.uint64(1))
        rot = (low << np.uint64(sh)) + (sd >> np.uint64(61 - sh))
        rot = gf.reduce_lazy(rot)
        acc = rot if acc is None else gf.add(acc, rot)
    # (K, bl, 3, 2) -> (bl, K, 2, 3)
    return jnp.transpose(acc, (1, 0, 3, 2))


def scan_sumcheck_batched_pallas(v, a, m, rs, perm=None,
                                 interpret: bool = False):
    """Drop-in for scan_sumcheck_batched: v, a, m (2, K, 2^bl) u64;
    rs (2, K, bl).  Returns (polys (bl, K, 2, 3), bound (v, a, m) (2, K)).

    perm: the bit-reversal permutation as a DEVICE ARRAY.  Callers jitting
    this function must pass it as a jit argument: as a closed-over constant
    XLA folds the gather into a ~130x slower form (measured 4.8ms vs 38us
    for three (2,4,2^16) tables)."""
    from ..gkr.sumcheck import _bitrev_perm

    bl = rs.shape[2]
    k = v.shape[1]
    n = v.shape[2]
    assert n == 1 << bl and n >= LANES, (n, bl)
    s = n // LANES

    if perm is None:
        perm = jnp.asarray(_bitrev_perm(bl))

    def to_planes(x):
        # convert BEFORE the gather: gathering u64 then word-splitting
        # fuses into a ~500x slower scalarized loop on TPU (measured)
        x4 = gf_u32.from_u64_planes(x)[:, :, perm]     # (4, K, N)
        return x4.reshape(4, k, s, LANES)

    rs4 = gf_u32.from_u64_planes(rs)                   # (4, K, bl)
    rs_b = jnp.broadcast_to(rs4[:, :, :, None], (4, k, bl, LANES))

    polys_part, bound = _fold_call(bl, k, interpret)(
        to_planes(v), to_planes(a), to_planes(m), rs_b)
    polys = _recombine_polys(polys_part)
    b64 = gf_u32.to_u64_planes(bound[:, :, :, 0])      # (2, K, 3)
    return polys, (b64[:, :, 0], b64[:, :, 1], b64[:, :, 2])
