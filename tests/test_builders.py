"""Programmatic circuit builder: matmul model proves end-to-end."""

import numpy as np
import jax.numpy as jnp

from virgo_plus_tpu.circuits.builders import CircuitBuilder, matmul_circuit
from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer
from virgo_plus_tpu.gkr import protocol
from virgo_plus_tpu.field import gf
from virgo_plus_tpu.field.ref import MOD
from virgo_plus_tpu.utils.glibc_rand import GlibcRandom


def test_matmul_circuit_evaluates_correctly():
    k = 4
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 20, (k, k))
    b = rng.integers(0, 1 << 20, (k, k))
    c = matmul_circuit(k, a, b)
    cc = compile_circuit(c)
    values = protocol.make_evaluator(cc)(input_buffer(cc))
    out = np.asarray(values[0, int(cc.value_off[cc.depth - 1]):])
    expect = (a.astype(object) @ b.astype(object)) % MOD
    # final layer holds the k*k sums (possibly among copies); check the
    # expected products appear in the output layer
    outs = set(int(x) for x in out[:cc.layers[cc.depth - 1].size])
    for i in range(k):
        for j in range(k):
            assert int(expect[i, j]) in outs


def test_builder_circuit_proves():
    cb = CircuitBuilder()
    xs = [cb.input(v) for v in (3, 5, 7, 11, 13, 17, 19, 23)]
    y = cb.sum([cb.mul(xs[i], xs[(i + 1) % 8]) for i in range(8)])
    z = cb.addc(cb.mulc(y, 12345), 678)
    cb.not_(cb.xor(cb.naab(xs[0], xs[1]), xs[2]))  # exercise gate types
    c = cb.build()
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    values = protocol.make_evaluator(cc)(input_buffer(cc))
    ch = protocol.make_challenges(cc, GlibcRandom(3396))
    proof = protocol.make_prover(cc, plans)(values, ch)
    out_block = values[:, int(cc.value_off[cc.depth - 1]):]
    ok, _, _ = protocol.make_verifier(cc)(proof, ch, out_block)
    assert bool(ok)


def test_assert_gates():
    import pytest
    from virgo_plus_tpu import driver

    def make(ok):
        cb = CircuitBuilder()
        xs = [cb.input(v) for v in range(2, 130)]  # 128 inputs
        y = cb.sum([cb.mul(xs[i], xs[i + 1]) for i in range(0, 128, 2)])
        d = cb.sub(y, y) if ok else cb.sub(y, xs[0])
        cb.assert_zero(d)
        cb.add(y, d)
        return cb.build()

    c_ok = make(True)
    cp = driver.compile_prover(c_ok)
    full, info = driver.prove(c_ok, cp)
    assert driver.verify(c_ok, full, cp).ok

    c_bad = make(False)
    cp2 = driver.compile_prover(c_bad)
    with pytest.raises(ValueError, match="assert gate failed"):
        driver.prove(c_bad, cp2)
