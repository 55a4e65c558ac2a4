"""Sumcheck round kernels: masked-prefix scan folds and exact field scatters.

Reference hot loop: sumcheckUpdateEach (/root/reference/src/prover.cpp:457-492)
folds three bookkeeping tables (V, addV, mult) in half per round and emits a
degree-2 polynomial.  TPU-native shape:

  * tables live in fixed 2^bl buffers; each round folds even/odd lanes into
    the prefix and masks the shrinking active region, so the whole phase is
    ONE lax.scan body (small graph, vectorized VPU work);
  * the per-round message is (a, b, c) of p(x) = sum_i m_i(x)*v_i(x) + a_i(x)
    computed from pair differences, identical term-by-term to the reference's
    interpolate/eval formulation;
  * gate scatters (segment sums with *field* addition) are precompiled to a
    sort permutation + prefix-sum + two gathers, because integer scatter-add
    cannot carry across limb planes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gf


# ---------------------------------------------------------------------------
# Field reductions
# ---------------------------------------------------------------------------

def tree_sum(x):
    """Sum (2, N) field elements along axis 1 -> (2,). Exact log-tree."""
    n = x.shape[1]
    if n == 0:
        return jnp.zeros((2,), jnp.uint64)
    while n > 1:
        if n % 2:
            x = jnp.pad(x, ((0, 0), (0, 1)))
            n += 1
        x = gf.add(x[:, 0::2], x[:, 1::2])
        n //= 2
    return x[:, 0]


def prefix_sum(x):
    """Inclusive field prefix sum along axis 1 (Hillis-Steele, exact)."""
    n = x.shape[1]
    d = 1
    while d < n:
        shifted = jnp.pad(x, ((0, 0), (d, 0)))[:, :n]
        x = gf.add(x, shifted)
        d *= 2
    return x


# ---------------------------------------------------------------------------
# Exact segment-sum scatter (precompiled)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ScatterPlan:
    perm: np.ndarray    # int32 (N,) sort-by-destination permutation
    starts: np.ndarray  # int32 (out_size,) into the 0-prepended prefix array
    ends: np.ndarray    # int32 (out_size,) (starts==ends -> empty -> zero)
    out_size: int

    @staticmethod
    def build(idx: np.ndarray, out_size: int) -> "ScatterPlan":
        idx = np.asarray(idx, dtype=np.int64)
        perm = np.argsort(idx, kind="stable").astype(np.int32)
        counts = np.bincount(idx, minlength=out_size).astype(np.int64)
        ends = np.cumsum(counts)
        starts = ends - counts
        return ScatterPlan(perm=perm, starts=starts.astype(np.int32),
                           ends=ends.astype(np.int32), out_size=out_size)

    def apply(self, values, arrs=None):
        """values: (2, N) contributions -> (2, out_size) field segment sums.

        arrs: optional (perm, starts, ends) device arrays passed as jit
        ARGUMENTS — indexing with the numpy members bakes them into the
        graph as multi-MB dense constants, which bloats MLIR modules enough
        to OOM the TPU compile helper; argument-passing keeps modules
        small."""
        if arrs is None:
            arrs = (self.perm, self.starts, self.ends)
        return apply_scatter_arrays(values, arrs)

    def arrays(self):
        return (jnp.asarray(self.perm), jnp.asarray(self.starts),
                jnp.asarray(self.ends))


def apply_scatter_arrays(values, arrs):
    """Segment-sum scatter from (perm, starts, ends) device arrays:
    values (2, N) contributions -> (2, out_size) exact field sums."""
    perm, starts, ends = arrs
    s = prefix_sum(values[:, perm])
    s0 = jnp.concatenate([jnp.zeros((2, 1), jnp.uint64), s], axis=1)
    return gf.sub(s0[:, ends], s0[:, starts])


def concat_scatter_plans(plans, in_sizes):
    """Fuse many ScatterPlans into ONE (for a single prefix-sum pass).

    plans[k] scatters a contribution block of length in_sizes[k] into its
    own destination range; the fused plan scatters the CONCATENATED
    contribution vector into the concatenated destination vector.  Segment
    sums are start/end differences of the inclusive prefix, so prefix mass
    crossing block boundaries cancels exactly — results are bit-identical
    to applying each plan separately, at 1/K the pass count.
    """
    perms, starts, ends = [], [], []
    in_off = 0
    perm_off = 0
    for pl, n_in in zip(plans, in_sizes):
        perms.append(pl.perm.astype(np.int64) + in_off)
        starts.append(pl.starts.astype(np.int64) + perm_off)
        ends.append(pl.ends.astype(np.int64) + perm_off)
        in_off += n_in
        perm_off += len(pl.perm)
    return ScatterPlan(
        perm=np.concatenate(perms).astype(np.int32),
        starts=np.concatenate(starts).astype(np.int32),
        ends=np.concatenate(ends).astype(np.int32),
        out_size=sum(pl.out_size for pl in plans))


# ---------------------------------------------------------------------------
# The scan fold
# ---------------------------------------------------------------------------

def scan_sumcheck(v, a, m, rs):
    """Run a full sumcheck over tables of size 2^bl with challenges rs (2, bl).

    Returns (polys (bl, 2, 3) [a,b,c], bound scalars (v, a, m) each (2,)).
    Round polynomial matches prover.cpp:470-487; binding matches the next
    round's eval(previousRandom).
    """
    bl = rs.shape[1]
    n = v.shape[1]
    assert n == 1 << bl, (n, bl)
    if bl == 0:
        return (jnp.zeros((0, 2, 3), jnp.uint64),
                (v[:, 0], a[:, 0], m[:, 0]))
    half = n // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, half), 1)

    def body(carry, x):
        cv, ca, cm = carry
        r, j = x
        r = r[:, None]
        v0, v1 = cv[:, 0::2], cv[:, 1::2]
        a0, a1 = ca[:, 0::2], ca[:, 1::2]
        m0, m1 = cm[:, 0::2], cm[:, 1::2]
        dv = gf.sub(v1, v0)
        da = gf.sub(a1, a0)
        dm = gf.sub(m1, m0)
        # p(x) coefficients summed over active pairs
        pa = gf.mul(dm, dv)
        pb = gf.add(gf.add(gf.mul(dm, v0), gf.mul(m0, dv)), da)
        pc = gf.add(gf.mul(m0, v0), a0)
        mask = lane < (half >> j)
        pa = jnp.where(mask, pa, 0)
        pb = jnp.where(mask, pb, 0)
        pc = jnp.where(mask, pc, 0)
        poly = jnp.stack([tree_sum(pa), tree_sum(pb), tree_sum(pc)], axis=1)
        # bind x <- r
        nv = gf.add(v0, gf.mul(dv, r))
        na = gf.add(a0, gf.mul(da, r))
        nm = gf.add(m0, gf.mul(dm, r))
        pad = ((0, 0), (0, half))
        return ((jnp.pad(nv, pad), jnp.pad(na, pad), jnp.pad(nm, pad)),
                poly)

    xs = (jnp.moveaxis(rs, 1, 0), jnp.arange(bl, dtype=jnp.int32))
    (fv, fa, fm), polys = jax.lax.scan(body, (v, a, m), xs)
    return polys, (fv[:, 0], fa[:, 0], fm[:, 0])


def eval_quad(poly, x):
    """poly (2,3) [a,b,c]; x (2,) -> ((a*x)+b)*x + c.  The degree-2 case of
    the generic dense-poly Horner (gkr/polynomial.py, the reference's
    quadratic_poly::eval, src/polynomial.cpp)."""
    from .polynomial import eval_at
    return eval_at(poly, x)


def quad_at_0_plus_1(poly):
    """p(0) + p(1) = a + b + 2c."""
    return gf.add(gf.add(poly[:, 0], poly[:, 1]),
                  gf.add(poly[:, 2], poly[:, 2]))


def mle_fold(values, rs):
    """Fold a (2, 2^k) table at point rs (2, k): returns (2,).
    Matches prover::Vres (prover.cpp:99-129) on zero-padded tables."""
    k = rs.shape[1]
    for j in range(k):
        r = rs[:, j:j + 1]
        v0, v1 = values[:, 0::2], values[:, 1::2]
        values = gf.add(gf.mul(v0, gf.sub(gf.ones((1,)), r)), gf.mul(v1, r))
    return values[:, 0]


def scan_sumcheck_batched(v, a, m, rs):
    """Batched sumcheck: K independent tables of the same size fold
    simultaneously (used to fuse same-shape phases across layers — they are
    independent once challenges are precomputed).

    v, a, m: (2, K, 2^bl); rs: (2, K, bl) per-table challenges.
    Returns (polys (bl, K, 2, 3), bound (v, a, m) each (2, K))."""
    bl = rs.shape[2]
    k = v.shape[1]
    n = v.shape[2]
    assert n == 1 << bl, (n, bl)
    if bl == 0:
        return (jnp.zeros((0, k, 2, 3), jnp.uint64),
                (v[:, :, 0], a[:, :, 0], m[:, :, 0]))
    half = n // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, half), 2)

    def tsum(x):
        # (2, K, half) -> (2, K)
        nn = x.shape[2]
        while nn > 1:
            x = gf.add(x[:, :, 0::2], x[:, :, 1::2])
            nn //= 2
        return x[:, :, 0]

    def body(carry, x):
        cv, ca, cm = carry
        r, j = x                      # r: (2, K)
        rr = r[:, :, None]
        v0, v1 = cv[:, :, 0::2], cv[:, :, 1::2]
        a0, a1 = ca[:, :, 0::2], ca[:, :, 1::2]
        m0, m1 = cm[:, :, 0::2], cm[:, :, 1::2]
        dv = gf.sub(v1, v0)
        da = gf.sub(a1, a0)
        dm = gf.sub(m1, m0)
        pa = gf.mul(dm, dv)
        pb = gf.add(gf.add(gf.mul(dm, v0), gf.mul(m0, dv)), da)
        pc = gf.add(gf.mul(m0, v0), a0)
        mask = lane < (half >> j)
        poly = jnp.stack([tsum(jnp.where(mask, pa, 0)),
                          tsum(jnp.where(mask, pb, 0)),
                          tsum(jnp.where(mask, pc, 0))], axis=2)  # (2,K,3)
        nv = gf.add(v0, gf.mul(dv, rr))
        na = gf.add(a0, gf.mul(da, rr))
        nm = gf.add(m0, gf.mul(dm, rr))
        pad = ((0, 0), (0, 0), (0, half))
        return ((jnp.pad(nv, pad), jnp.pad(na, pad), jnp.pad(nm, pad)),
                poly)

    xs = (jnp.moveaxis(rs, 2, 0), jnp.arange(bl, dtype=jnp.int32))
    (fv, fa, fm), polys = jax.lax.scan(body, (v, a, m), xs)
    # polys: (bl, 2, K, 3) -> (bl, K, 2, 3)
    polys = jnp.moveaxis(polys, 1, 2)
    return polys, (fv[:, :, 0], fa[:, :, 0], fm[:, :, 0])


# ---------------------------------------------------------------------------
# Bit-reversed fold layout
# ---------------------------------------------------------------------------
# The masked-prefix fold reads even/odd strided slices every round; on TPU
# the minor-axis stride-2 access costs ~100x the arithmetic.  In BIT-REVERSED
# order the natural pair (2i, 2i+1) sits at positions (q, q + n/2): each
# round splits the buffer into contiguous halves (free on TPU), and the
# fold output written at position q is ALREADY the bit-reversed layout of
# the half-size table, so no data movement ever happens.  Sum reassociation
# is exact in this field, so round messages are bit-identical.

import functools


@functools.lru_cache(maxsize=None)
def _bitrev_perm(bl: int):
    n = 1 << bl
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bl):
        rev |= ((idx >> b) & 1) << (bl - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _bitrev_vals(bl: int):
    """value v[q] = natural pair index of bit-reversed position q."""
    return _bitrev_perm(bl)  # rev is an involution's own inverse table


import os as _os

# Threshold below which the masked-scan fold is used instead of the
# bit-reversed unrolled fold (env-tunable; BR_MIN_BL=99 reproduces the
# pure masked-scan prover bit-for-bit, matching its compile cache).
BR_MIN_BL = int(_os.environ.get("VPT_BR_MIN_BL", "10"))


def scan_sumcheck_batched_br(v, a, m, rs):
    """Bit-reversed-layout batched sumcheck; same signature and bit-exact
    same outputs as scan_sumcheck_batched.

    Rounds unroll with genuinely shrinking shapes: every round is two
    contiguous half-splits, a fused fold, and three half-size reductions —
    no strided access, no masks, half the arithmetic of the masked-prefix
    scan.  Small tables (bl < BR_MIN_BL) delegate to the masked scan: the
    strided access is cheap there, and unrolling sub-tile shapes bloats
    Mosaic layout work."""
    bl = rs.shape[2]
    if bl < BR_MIN_BL:
        return scan_sumcheck_batched(v, a, m, rs)
    k = v.shape[1]
    n = v.shape[2]
    assert n == 1 << bl, (n, bl)
    if bl == 0:
        return (jnp.zeros((0, k, 2, 3), jnp.uint64),
                (v[:, :, 0], a[:, :, 0], m[:, :, 0]))
    perm = jnp.asarray(_bitrev_perm(bl))
    cv = v[:, :, perm]
    ca = a[:, :, perm]
    cm = m[:, :, perm]

    def tsum(x):
        nn = x.shape[2]
        while nn > 1:
            x = gf.add(x[:, :, :nn // 2], x[:, :, nn // 2:nn])
            nn //= 2
        return x[:, :, 0]

    polys = []
    for j in range(bl):
        half = cv.shape[2] // 2
        rr = rs[:, :, j][:, :, None]
        v0, v1 = cv[:, :, :half], cv[:, :, half:]
        a0, a1 = ca[:, :, :half], ca[:, :, half:]
        m0, m1 = cm[:, :, :half], cm[:, :, half:]
        dv = gf.sub(v1, v0)
        da = gf.sub(a1, a0)
        dm = gf.sub(m1, m0)
        pa = gf.mul(dm, dv)
        pb = gf.add(gf.add(gf.mul(dm, v0), gf.mul(m0, dv)), da)
        pc = gf.add(gf.mul(m0, v0), a0)
        polys.append(jnp.stack([tsum(pa), tsum(pb), tsum(pc)], axis=2))
        cv = gf.add(v0, gf.mul(dv, rr))
        ca = gf.add(a0, gf.mul(da, rr))
        cm = gf.add(m0, gf.mul(dm, rr))
    out = jnp.moveaxis(jnp.stack(polys, axis=0), 1, 2)  # (bl, K, 2, 3)
    return out, (cv[:, :, 0], ca[:, :, 0], cm[:, :, 0])


# ---------------------------------------------------------------------------
# Kernel selection
# ---------------------------------------------------------------------------
# The Pallas fused fold (pallas_kernels/sumcheck_fold.py) runs the whole
# phase VMEM-resident and is the production TPU path; the XLA paths remain
# for CPU, for tiny tables, and as the bit-exact cross-check.

PALLAS_FOLD = _os.environ.get("VPT_PALLAS_FOLD", "1") != "0"
PALLAS_MIN_BL = int(_os.environ.get("VPT_PALLAS_MIN_BL", "7"))
PALLAS_MAX_BL = int(_os.environ.get("VPT_PALLAS_MAX_BL", "17"))
PALLAS_INTERPRET = _os.environ.get("VPT_PALLAS_INTERPRET", "0") == "1"


def _pallas_ok(bl: int) -> bool:
    if not PALLAS_FOLD or not (PALLAS_MIN_BL <= bl <= PALLAS_MAX_BL):
        return False
    if PALLAS_INTERPRET:
        return True
    import jax
    return jax.default_backend() not in ("cpu",)


def scan_sumcheck_auto(v, a, m, rs, perm=None):
    """Backend-dispatching batched sumcheck fold (bit-exact either way).

    perm: bit-reversal permutation for the Pallas path; MUST be passed as a
    jit argument by jitted callers (constant gathers are ~130x slower on
    TPU), ignored by the XLA fallback."""
    bl = rs.shape[2]
    if _pallas_ok(bl):
        from ..pallas_kernels.sumcheck_fold import scan_sumcheck_batched_pallas
        return scan_sumcheck_batched_pallas(v, a, m, rs, perm=perm,
                                            interpret=PALLAS_INTERPRET)
    return scan_sumcheck_batched_br(v, a, m, rs)
