"""Keccak/Merkle/FFT kernels vs independent oracles (SURVEY.md §7 M3)."""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp

from virgo_plus_tpu.pc.keccak import sha3_256_x64, digest_to_bytes
from virgo_plus_tpu.pc.merkle import create_tree, merkle_path, root_of
from virgo_plus_tpu.pc.fft import fft, ifft, powers
from virgo_plus_tpu.field import gf
from virgo_plus_tpu.field.ref import Fq2, MOD, root_of_unity as ref_rou


def _words_from_bytes(msgs):
    """list of 64-byte messages -> (8, N) uint64 LE words."""
    out = np.zeros((8, len(msgs)), dtype=np.uint64)
    for k, m in enumerate(msgs):
        for w in range(8):
            out[w, k] = int.from_bytes(m[8 * w:8 * w + 8], "little")
    return jnp.asarray(out)


def test_sha3_256_matches_hashlib():
    rng = np.random.default_rng(0)
    msgs = [rng.bytes(64) for _ in range(33)] + [b"\x00" * 64, b"\xff" * 64]
    got = jax.jit(sha3_256_x64)(_words_from_bytes(msgs))
    got = np.asarray(got)
    for k, m in enumerate(msgs):
        expect = hashlib.sha3_256(m).digest()
        mine = b"".join(int(got[w, k]).to_bytes(8, "little") for w in range(4))
        assert mine == expect, k


def test_merkle_tree_matches_python():
    rng = np.random.default_rng(1)
    n = 16
    leaves_bytes = [rng.bytes(32) for _ in range(n)]
    leaves = np.zeros((4, n), dtype=np.uint64)
    for k, m in enumerate(leaves_bytes):
        for w in range(4):
            leaves[w, k] = int.from_bytes(m[8 * w:8 * w + 8], "little")
    tree = jax.jit(create_tree)(jnp.asarray(leaves))
    # python oracle: heap layout, parent = sha3(left||right)
    heap = [None] * (2 * n)
    for i in range(n):
        heap[n + i] = leaves_bytes[i]
    for i in range(n - 1, 0, -1):
        heap[i] = hashlib.sha3_256(heap[2 * i] + heap[2 * i + 1]).digest()
    t = np.asarray(tree)
    for i in range(1, 2 * n):
        mine = b"".join(int(t[w, i]).to_bytes(8, "little") for w in range(4))
        assert mine == heap[i], i
    # path verification round-trip
    for pos in (0, 5, n - 1):
        path = np.asarray(merkle_path(tree, pos))
        cur = leaves_bytes[pos]
        p = pos
        for d in range(path.shape[1]):
            sib = b"".join(int(path[w, d]).to_bytes(8, "little")
                           for w in range(4))
            cur = (hashlib.sha3_256(sib + cur).digest() if p & 1
                   else hashlib.sha3_256(cur + sib).digest())
            p //= 2
        root = b"".join(int(np.asarray(tree)[w, 1]).to_bytes(8, "little")
                        for w in range(4))
        assert cur == root


def _to_fq2_list(x):
    r, i = gf.to_u64(x)
    return [Fq2.raw(int(a), int(b)) for a, b in zip(r.ravel(), i.ravel())]


def test_fft_matches_naive_eval():
    rng = np.random.default_rng(2)
    lg, lg_order = 3, 5
    n, order = 1 << lg, 1 << lg_order
    cr = rng.integers(0, MOD, n, dtype=np.uint64)
    ci = rng.integers(0, MOD, n, dtype=np.uint64)
    coeffs = gf.from_u64(cr, ci)
    rou_int = gf.root_of_unity_int(lg_order)
    got = _to_fq2_list(jax.jit(lambda c: fft(c, lg_order, rou_int))(coeffs))
    w = Fq2.raw(*rou_int)
    cs = [Fq2.raw(int(a), int(b)) for a, b in zip(cr, ci)]
    for k in range(order):
        x = w.pow(k)
        val = Fq2.raw(0, 0)
        for j in range(n - 1, -1, -1):
            val = val * x + cs[j]
        assert got[k] == val, k


def test_ifft_roundtrip():
    rng = np.random.default_rng(3)
    lg = 6
    n = 1 << lg
    vr = rng.integers(0, MOD, n, dtype=np.uint64)
    vi = rng.integers(0, MOD, n, dtype=np.uint64)
    evals = gf.from_u64(vr, vi)
    rou_int = gf.root_of_unity_int(lg)
    coeffs = jax.jit(lambda e: ifft(e, rou_int))(evals)
    back = jax.jit(lambda c: fft(c, lg, rou_int))(coeffs)
    assert bool(jnp.all(back == evals))


def test_powers():
    rou_int = gf.root_of_unity_int(10)
    p = powers(rou_int, 13)
    w = Fq2.raw(*rou_int)
    got = _to_fq2_list(p)
    for k in range(13):
        assert got[k] == w.pow(k)
