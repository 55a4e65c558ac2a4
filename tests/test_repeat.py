"""repeat_layers (main.cpp:114-131 intent): replicas prove and evaluate
identically to the base circuit."""

import numpy as np

from virgo_plus_tpu import driver
from virgo_plus_tpu.circuits.layered import (randomize, subset_init,
                                             repeat_layers)
from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer
from virgo_plus_tpu.gkr import protocol


def test_repeat_replicas_evaluate_identically():
    c = randomize(3, 5, seed=8)
    base_sizes = [L.size for L in c.layers]
    c2 = repeat_layers(c, 3)
    assert [L.size for L in c2.layers] == (
        [base_sizes[0]] + [3 * s for s in base_sizes[1:]])
    subset_init(c2)
    cc = compile_circuit(c2)
    values = np.asarray(protocol.make_evaluator(cc)(input_buffer(cc)))
    for i in range(1, cc.depth):
        off = int(cc.value_off[i])
        sz = base_sizes[i]
        blk0 = values[:, off:off + sz]
        for j in range(1, 3):
            blkj = values[:, off + j * sz:off + (j + 1) * sz]
            assert np.array_equal(blk0, blkj), (i, j)


def test_repeat_circuit_proves_and_verifies():
    c = randomize(3, 7, seed=8)
    c2 = repeat_layers(c, 2)
    subset_init(c2)
    rep = driver.run(circuit=c2)
    assert rep.ok
