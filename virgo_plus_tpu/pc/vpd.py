"""VPD opening: LDT commit phase driver, FRI query walks, and verification.

Reference: /root/reference/lib/virgo/src/vpd_verifier.cpp.  The prover-side
folds/commits run on device (virgo_pc.py); the query phase is host-side
control logic over tiny gathers (33 repetitions x log-many levels), using
exact python-int field arithmetic (field/ref.py) and hashlib SHA3 — the
succinct verifier is latency-bound, not throughput-bound.

Proof-size accounting replicates the reference's visited-bitmap dedup
byte-for-byte, including its quirk of resetting the counter between the l
and h initial queries so only the h bytes are charged
(vpd_verifier.cpp:152-155).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List

import numpy as np

from ..field import gf
from ..field.ref import Fq2
from . import virgo_pc
from .virgo_pc import LOG_SLICE, SLICES, RATE

ONE = Fq2.raw(1, 0)


def _el_bytes(real: int, img: int) -> bytes:
    return int(real).to_bytes(8, "little") + int(img).to_bytes(8, "little")


def _hash64(data: bytes) -> bytes:
    assert len(data) == 64
    return hashlib.sha3_256(data).digest()


def leaf_hash_host(pairs) -> bytes:
    """pairs: list of 65 ((real,img),(real,img)) value pairs -> 32B digest
    (the fri.cpp:96-124 chain)."""
    h = b"\x00" * 32
    for (a, b) in pairs:
        h = _hash64(_el_bytes(*a) + _el_bytes(*b) + h)
    return h


def verify_merkle_host(root: bytes, path: List[bytes], pos: int,
                       pairs) -> bool:
    """vpd_verifier.cpp:9-39: path[-1] must equal the chained value hash and
    hash up to the root."""
    cur = path[-1]
    for sib in path[:-1]:
        if pos & 1:
            cur = _hash64(sib + cur)
        else:
            cur = _hash64(cur + sib)
        pos //= 2
    return cur == root and leaf_hash_host(pairs) == path[-1]


@dataclass
class OracleHost:
    """Host mirror of a committed oracle for query answering."""
    codeword: np.ndarray     # (2, 65, N) uint64
    tree: np.ndarray         # (4, 2*(N/2)) digest words
    n: int                   # N (values per slice)

    @staticmethod
    def of(oracle: virgo_pc.Oracle) -> "OracleHost":
        cw = np.asarray(oracle.codeword)
        return OracleHost(codeword=cw, tree=np.asarray(oracle.tree),
                          n=cw.shape[2])

    def root(self) -> bytes:
        return b"".join(int(self.tree[w, 1]).to_bytes(8, "little")
                        for w in range(4))

    def node(self, i: int) -> bytes:
        return b"".join(int(self.tree[w, i]).to_bytes(8, "little")
                        for w in range(4))

    def pair(self, s: int, pos: int):
        half = self.n // 2
        a = (int(self.codeword[0, s, pos]), int(self.codeword[1, s, pos]))
        b = (int(self.codeword[0, s, pos + half]),
             int(self.codeword[1, s, pos + half]))
        return (a, b)

    def all_pairs(self, pos: int):
        return [self.pair(s, pos) for s in range(SLICES + 1)]

    def path(self, pos: int) -> List[bytes]:
        """Siblings bottom-up + the leaf itself last (fri.cpp:177-204)."""
        nleaf = self.n // 2
        out = []
        p = nleaf + pos
        leaf = self.node(p)
        while p > 1:
            out.append(self.node(p ^ 1))
            p //= 2
        out.append(leaf)
        return out


class SizeAccount:
    """Replicates the reference's visited-bitmap proof-size dedup."""

    def __init__(self, bl: int, n_levels: int):
        n = 1 << (bl + RATE - LOG_SLICE)
        self.visited_init = [np.zeros(n, bool), np.zeros(n, bool)]
        self.visited_witness = [np.zeros(1 << (bl + RATE), bool),
                                np.zeros(1 << (bl + RATE), bool)]
        self.visited = [np.zeros((1 << (bl + RATE - LOG_SLICE)) * 4 *
                                 (SLICES + 1), bool)
                        for _ in range(n_levels)]

    def init_query(self, oracle_ind: int, pos: int, depth: int,
                   path_positions) -> int:
        """fri.cpp:148-205 accounting for one initial-oracle query."""
        new = 0
        vw = self.visited_witness[oracle_ind]
        for i in range(SLICES):
            for s in range(2):
                idx = pos << (LOG_SLICE + 1) | i << 1 | s
                if not vw[idx]:
                    vw[idx] = True
                    new += 16
        vi = self.visited_init[oracle_ind]
        p = path_positions
        for q in p:
            if not vi[q ^ 1]:
                new += 32
            vi[q] = True
            vi[q ^ 1] = True
        return new

    def step_query(self, lvl: int, bp: int, path_positions) -> int:
        """fri.cpp:229-287 accounting.  NB the reference's value-dedup
        check reads ``visited[lvl][mapping & ~1]`` — *codeword* interleaved
        indices — from the same array its path walk marks with *heap*
        indices (fri.cpp:254-266 vs 276-281).  When a prior path marking
        aliases one of the pair bases, the 16-byte value charge is skipped;
        we replicate the aliasing bit-for-bit."""
        v = self.visited[lvl]
        visited_element = False
        for j in range(SLICES):
            if v[bp << (LOG_SLICE + 1) | j << 1]:
                visited_element = True
        new = 0 if visited_element else 16
        for q in path_positions:
            if not v[q ^ 1]:
                new += 32
                v[q ^ 1] = True
                v[q] = True
        return new


def _fq2_of(arr, idx=None) -> Fq2:
    a = np.asarray(arr)
    if idx is None:
        return Fq2.raw(int(a[0]), int(a[1]))
    return Fq2.raw(int(a[0, idx]), int(a[1, idx]))


def draw_positions(rng, bl: int) -> List[int]:
    """Per-repetition initial query position (vpd_verifier.cpp:120-122):
    rand() with rejection until even and >= 2^(bl - LOG_SLICE)."""
    lg0 = bl + RATE - LOG_SLICE
    pows = []
    for _ in range(virgo_pc.LDT_REPEATS):
        while True:
            p = rng.rand() % (1 << lg0)
            if not (p < (1 << (bl - LOG_SLICE)) or p % 2 == 1):
                break
        pows.append(p)
    return pows


@dataclass
class QueryAnswers:
    """Per repetition: initial l/h pairs+paths and per-level pairs+paths —
    the serialized content of the FRI opening (the reference's
    request_init_value_with_merkle / request_step_commit responses)."""
    init_l: list      # [(pairs, path)] per rep
    init_h: list
    levels: list      # [[(pairs, path) per level] per rep]


def answer_queries(pows: List[int], bl: int, l_host: OracleHost,
                   h_host: OracleHost,
                   level_hosts: List[OracleHost]):
    """Prover side: gather value pairs and Merkle paths for every query.
    Also computes the reference's deduplicated proof size."""
    lg0 = bl + RATE - LOG_SLICE
    acct = SizeAccount(bl, len(level_hosts))
    proof_size = 0
    init_l, init_h, levels = [], [], []
    for pow0 in pows:
        p0 = pow0 // 2
        ppos = _path_positions(p0, l_host.n // 2)
        acct.init_query(0, p0, lg0 - 1, ppos)
        proof_size += acct.init_query(1, p0, lg0 - 1, ppos)
        init_l.append((l_host.all_pairs(p0), l_host.path(p0)))
        init_h.append((h_host.all_pairs(p0), h_host.path(p0)))
        lvl_answers = []
        pw = pow0
        for lvl, host in enumerate(level_hosts):
            if lvl > 0:
                pw = pw % (1 << (lg0 - lvl))
            bp = (pw // 2) % (host.n // 2)
            ppos = _path_positions(bp, host.n // 2)
            proof_size += acct.step_query(lvl, bp, ppos)
            lvl_answers.append((host.all_pairs(bp), host.path(bp)))
        levels.append(lvl_answers)
    return QueryAnswers(init_l=init_l, init_h=init_h, levels=levels),         proof_size


def check_queries(pows: List[int], answers: QueryAnswers, bl: int,
                  level_randomness: List[Fq2], level_roots: List[bytes],
                  q_coefs: np.ndarray, all_sum: List[Fq2], root_l: bytes,
                  root_h: bytes, final_codeword: np.ndarray):
    """Verifier side of the 33 query walks + final-codeword checks
    (vpd_verifier.cpp:101-326), consuming only serialized answers."""
    log_length = bl
    lg0 = log_length + RATE - LOG_SLICE      # log initial codeword size
    srec = 1 << (bl - LOG_SLICE)
    inv_2 = Fq2.raw(2, 0).inv()

    q_coefs = np.asarray(q_coefs)            # (2, 64, srec)

    # Batched q-polynomial evaluation for all repetitions' (s0, s1) points
    # (vpd_verifier.cpp:206-216): the dominant verifier cost as python-int
    # Fq2 (33 reps x 64 slices x srec muls) — exact numpy u64 instead.
    from ..field import np_ops as fnp
    rou0 = Fq2.raw(*gf.root_of_unity_int(lg0))
    x_pts = np.zeros((2, 2 * virgo_pc.LDT_REPEATS), dtype=np.uint64)
    for rep in range(virgo_pc.LDT_REPEATS):
        pw = pows[rep]
        e0 = rou0.pow(pw // 2)
        e1 = rou0.pow((pw + (1 << lg0)) // 2)
        x_pts[0, 2 * rep], x_pts[1, 2 * rep] = e0.real, e0.img
        x_pts[0, 2 * rep + 1], x_pts[1, 2 * rep + 1] = e1.real, e1.img
    q_at = fnp.horner(q_coefs, x_pts)        # (2, 2R, 64)

    ok = True
    for rep in range(virgo_pc.LDT_REPEATS):
        pow_ = None
        root_of_unity = None
        y = None
        equ_beta = None
        alpha_pairs = None
        beta_pairs = None
        for i in range(log_length - LOG_SLICE):
            lg_cur = lg0 - i
            if i == 0:
                pow_ = pows[rep]
                root_of_unity = Fq2.raw(*gf.root_of_unity_int(lg_cur))
                y = root_of_unity.pow(pow_)
            else:
                root_of_unity = root_of_unity * root_of_unity
                pow_ = pow_ % (1 << lg_cur)
                y = y * y
            s0_pow = pow_ // 2
            s1_pow = (pow_ + (1 << lg_cur)) // 2
            s0 = root_of_unity.pow(s0_pow)
            s1 = root_of_unity.pow(s1_pow)

            if i == 0:
                p0 = min(s0_pow, s1_pow)
                alpha_l, path_l = answers.init_l[rep]
                alpha_h, path_h = answers.init_h[rep]
                if not verify_merkle_host(root_l, path_l, p0, alpha_l):
                    return False
                if not verify_merkle_host(root_h, path_h, p0, alpha_h):
                    return False
                # level-0 fold query; the reference mapping reduces to the
                # pair (pos mod half, pos mod half + half)
                n0 = 1 << (lg0 - 1)       # level-0 codeword size per slice
                bp = (pow_ // 2) % (n0 // 2)
                beta_pairs, path_b = answers.levels[rep][0]
                if not verify_merkle_host(level_roots[0], path_b, bp,
                                          beta_pairs):
                    return False

                inv_mu = root_of_unity.pow(pow_ // 2).inv()
                # q evaluations at s0, s1 per slice (coefficient dots)
                x0, x1 = s0, s1
                rou_v = [None] * 2
                alpha_vals = []
                for j in range(SLICES + 1):
                    if j < SLICES:
                        tst0 = Fq2.raw(int(q_at[0, 2 * rep, j]),
                                       int(q_at[1, 2 * rep, j]))
                        tst1 = Fq2.raw(int(q_at[0, 2 * rep + 1, j]),
                                       int(q_at[1, 2 * rep + 1, j]))
                    else:
                        tst0 = Fq2.raw(0, 0)   # mask q coefficients: zero
                        tst1 = Fq2.raw(0, 0)
                    a_l0 = Fq2.raw(*alpha_l[j][0])
                    a_l1 = Fq2.raw(*alpha_l[j][1])
                    a_h0 = Fq2.raw(*alpha_h[j][0])
                    a_h1 = Fq2.raw(*alpha_h[j][1])
                    if j == SLICES:
                        # mask slice: msk_rou = x^(ss/gap) with gap=ss -> x
                        m0 = a_l0 * tst0 - (x0 - ONE) * a_h0
                        m1 = a_l1 * tst1 - (x1 - ONE) * a_h1
                        v0 = (m0 * ONE - all_sum[j]) * x0.inv()
                        v1 = (m1 * ONE - all_sum[j]) * x1.inv()
                    else:
                        rou0 = x0.pow(1 << (lg0 - RATE))
                        rou1 = x1.pow(1 << (lg0 - RATE))
                        v0 = (a_l0 * tst0 - (rou0 - ONE) * a_h0)
                        v0 = (v0 * Fq2.raw(srec, 0) - all_sum[j]) * x0.inv()
                        v1 = (a_l1 * tst1 - (rou1 - ONE) * a_h1)
                        v1 = (v1 * Fq2.raw(srec, 0) - all_sum[j]) * x1.inv()
                    if s0_pow > s1_pow:
                        v0, v1 = v1, v0
                    p_val = (v0 + v1) * inv_2 + \
                        (v0 - v1) * inv_2 * level_randomness[0] * inv_mu
                    b0 = Fq2.raw(*beta_pairs[j][0])
                    b1 = Fq2.raw(*beta_pairs[j][1])
                    if p_val != b0 and p_val != b1:
                        return False
                    equ_beta = (p_val == b1)
            else:
                alpha_pairs = beta_pairs
                lvl = i
                nl = 1 << (lg0 - 1 - lvl)  # level codeword size per slice
                bp = (pow_ // 2) % (nl // 2)
                beta_pairs, path_b = answers.levels[rep][lvl]
                if not verify_merkle_host(level_roots[lvl], path_b, bp,
                                          beta_pairs):
                    return False
                inv_mu = root_of_unity.pow(pow_ // 2).inv()
                r_i = level_randomness[i]
                for j in range(SLICES + 1):
                    a0 = Fq2.raw(*alpha_pairs[j][0])
                    a1 = Fq2.raw(*alpha_pairs[j][1])
                    p0v = (a0 + a1) * inv_2 + (a0 - a1) * inv_2 * r_i * inv_mu
                    p1v = (a0 + a1) * inv_2 + (a1 - a0) * inv_2 * r_i * inv_mu
                    b0 = Fq2.raw(*beta_pairs[j][0])
                    b1 = Fq2.raw(*beta_pairs[j][1])
                    if p0v != b0 and p0v != b1 and p1v != b0 and p1v != b1:
                        return False

        # final codeword constancy (vpd_verifier.cpp:311-325): the
        # reference checks only the first 2^(RATE-1) positions per real
        # slice, but every adjacent pair of the mask slice.
        fc = np.asarray(final_codeword)
        hr = 1 << (RATE - 1)
        for sl in range(SLICES):
            if not (fc[:, sl, :hr] == fc[:, sl, :1]).all():
                return False
        if not (fc[:, SLICES, :] == fc[:, SLICES, :1]).all():
            return False
    return ok


def verify_queries(rng, bl: int, l_host: OracleHost, h_host: OracleHost,
                   level_hosts: List[OracleHost], level_randomness: List[Fq2],
                   level_roots: List[bytes], q_coefs: np.ndarray,
                   all_sum: List[Fq2], root_l: bytes, root_h: bytes,
                   final_codeword: np.ndarray):
    """Interactive-equivalent wrapper: draw positions, answer, check.
    Returns (ok, dedup proof size in bytes)."""
    pows = draw_positions(rng, bl)
    answers, proof_size = answer_queries(pows, bl, l_host, h_host,
                                         level_hosts)
    ok = check_queries(pows, answers, bl, level_randomness, level_roots,
                       q_coefs, all_sum, root_l, root_h, final_codeword)
    return ok, proof_size


def _path_positions(pos: int, nleaf: int):
    out = []
    p = nleaf + pos
    while p > 1:
        out.append(p)
        p //= 2
    return out


def _poly_eval(q_coefs, j: int, x: Fq2) -> Fq2:
    """sum_k q_coefs[j][k] * x^k (vpd_verifier.cpp:206-216)."""
    acc = Fq2.raw(0, 0)
    xp = ONE
    for k in range(q_coefs.shape[2]):
        acc = acc + Fq2.raw(int(q_coefs[0, j, k]),
                            int(q_coefs[1, j, k])) * xp
        xp = xp * x
    return acc
