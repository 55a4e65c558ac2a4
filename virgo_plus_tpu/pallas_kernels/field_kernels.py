"""Pallas TPU kernels over the u32 limb-plane field representation.

Mosaic has no 64-bit integers, so Pallas kernels use field/gf_u32.py's
4x-uint32 limb planes.  This module is the production kernel path being
built out (round 2 focus); the first kernel here fuses the sumcheck
bind step  z = v0 + (v1 - v0) * r  into one VMEM-resident pass —
the pattern every fold round repeats three times per table.

All kernels are validated against the XLA path in interpret mode (exact
field arithmetic: outputs must be bit-identical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import gf_u32


def _fold_bind_kernel(v0_ref, v1_ref, r_ref, out_ref):
    v0 = v0_ref[:]
    v1 = v1_ref[:]
    r = r_ref[:]
    d = gf_u32.sub(v1, v0)
    out_ref[:] = gf_u32.add(v0, gf_u32.mul(d, r))


def fold_bind_pallas(v0, v1, r, interpret: bool = False):
    """v0, v1: (4, N) u32 limb planes; r: (4, 1) broadcast challenge.
    Returns v0 + (v1 - v0) * r, bit-identical to the gf_u32 ops."""
    n = v0.shape[1]
    r_b = jnp.broadcast_to(r.reshape(4, 1), (4, n))
    return pl.pallas_call(
        _fold_bind_kernel,
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(v0, v1, r_b)
