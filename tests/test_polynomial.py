"""Dense polynomial ops vs the exact oracle."""

import numpy as np

from virgo_plus_tpu.gkr import polynomial as P
from virgo_plus_tpu.field import gf
from virgo_plus_tpu.field.ref import Fq2, MOD


def _el(v):
    return gf.from_u64(np.uint64(v % MOD), np.uint64((v * 7) % MOD))


def _fq(v):
    return Fq2.raw(v % MOD, (v * 7) % MOD)


def test_eval_add_mul():
    p = P.poly([_el(3), _el(5), _el(11)])          # 3x^2 + 5x + 11
    q = P.poly([_el(2), _el(9)])                   # 2x + 9
    x = _el(12345)
    # eval
    got = P.eval_at(p, x)
    xe = _fq(12345)
    expect = (_fq(3) * xe + _fq(5)) * xe + _fq(11)
    r, i = gf.to_u64(got)
    assert (int(r), int(i)) == (expect.real, expect.img)
    # add (degree promotion)
    s = P.add(p, q)
    assert P.degree(s) == 2
    gr, gi = gf.to_u64(P.eval_at(s, x))
    es = expect + (_fq(2) * xe + _fq(9))
    assert (int(gr), int(gi)) == (es.real, es.img)
    # mul -> cubic
    m = P.mul(p, q)
    assert P.degree(m) == 3
    gr, gi = gf.to_u64(P.eval_at(m, x))
    em = expect * (_fq(2) * xe + _fq(9))
    assert (int(gr), int(gi)) == (em.real, em.img)
