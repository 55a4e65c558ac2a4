"""Field kernel vs the exact python-int oracle (SURVEY.md §7 M0)."""

import numpy as np
import jax
import pytest

from virgo_plus_tpu.field import gf
from virgo_plus_tpu.field.ref import Fq2, MOD, root_of_unity as ref_rou


def _rand_batch(rng, n):
    real = rng.integers(0, MOD, size=n, dtype=np.uint64)
    img = rng.integers(0, MOD, size=n, dtype=np.uint64)
    return real, img


def _check(x, expected):
    real, img = gf.to_u64(x)
    got = [Fq2.raw(int(r), int(i)) for r, i in zip(real.ravel(), img.ravel())]
    assert got == list(expected)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    n = 257
    ar, ai = _rand_batch(rng, n)
    br, bi = _rand_batch(rng, n)
    a = gf.from_u64(ar, ai)
    b = gf.from_u64(br, bi)
    ao = [Fq2.raw(int(r), int(i)) for r, i in zip(ar, ai)]
    bo = [Fq2.raw(int(r), int(i)) for r, i in zip(br, bi)]
    return a, b, ao, bo


def test_roundtrip(batch):
    a, _, ao, _ = batch
    _check(a, ao)


def test_add(batch):
    a, b, ao, bo = batch
    _check(jax.jit(gf.add)(a, b), [x + y for x, y in zip(ao, bo)])


def test_sub(batch):
    a, b, ao, bo = batch
    _check(jax.jit(gf.sub)(a, b), [x - y for x, y in zip(ao, bo)])


def test_neg(batch):
    a, _, ao, _ = batch
    _check(jax.jit(gf.neg)(a), [-x for x in ao])


def test_mul(batch):
    a, b, ao, bo = batch
    _check(jax.jit(gf.mul)(a, b), [x * y for x, y in zip(ao, bo)])


def test_mul_edge_cases():
    specials = [0, 1, 2, MOD - 1, MOD - 2, (1 << 32) - 1, 1 << 32, (1 << 60)]
    vals = [(r, i) for r in specials for i in specials]
    ar = np.array([v[0] for v in vals], dtype=np.uint64)
    ai = np.array([v[1] for v in vals], dtype=np.uint64)
    a = gf.from_u64(ar, ai)
    prod = gf.mul(a, a[:, ::-1])
    rev = [Fq2.raw(int(r), int(i)) for r, i in zip(ar[::-1], ai[::-1])]
    fwd = [Fq2.raw(int(r), int(i)) for r, i in zip(ar, ai)]
    _check(prod, [x * y for x, y in zip(fwd, rev)])


def test_inv():
    rng = np.random.default_rng(1)
    ar, ai = _rand_batch(rng, 9)
    a = gf.from_u64(ar, ai)
    prod = gf.mul(a, jax.jit(gf.inv)(a))
    real, img = gf.to_u64(prod)
    assert list(real) == [1] * 9 and list(img) == [0] * 9


def test_root_of_unity():
    for k in (1, 2, 5, 13, 20):
        r = gf.root_of_unity_int(k)
        o = ref_rou(k)
        assert r == (o.real, o.img)
        # order exactly 2^k
        assert Fq2.raw(*r).pow(1 << k) == Fq2.raw(1, 0)
        assert Fq2.raw(*r).pow(1 << (k - 1)) != Fq2.raw(1, 0)


def test_pow_static():
    x = gf.from_u64(np.array([12345678901234567], dtype=np.uint64),
                    np.array([987654321], dtype=np.uint64))
    got = gf.pow_static(x, 0xDEADBEEF)
    _check(got, [Fq2.raw(12345678901234567, 987654321).pow(0xDEADBEEF)])
