"""AOT compilation of a layered circuit into static device arrays.

The reference walks gate objects with switches in every protocol loop; the
TPU-native design precompiles the circuit once into index/coefficient arrays
so every jitted kernel is a branch-free gather / segment-sum / fused
multiply-add with fixed shapes:

  * one concatenated value buffer with per-layer power-of-two blocks
    (layer i occupies value_off[i] : value_off[i] + 2^bit_length),
  * per-layer gather indices x_idx (left input, in layer i-1's block) and
    y_idx (right input, global index into the value buffer),
  * per-gate (A, B, C, D) coefficient planes (gates.py),
  * phase-2 scatter coordinates (source layer l, subset id lv) flattened to
    one index into a concatenated dad-table buffer,
  * dad gather indices for initialising phase-2 V tables and Liu merges.

Forward evaluation (prover.cpp:27-91 analogue) is then, per layer:
    x = values[x_idx]; y = values[y_idx]
    out = A*x + B*y + C*(x*y) + D
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gf
from .gates import GateType, coeff_tables
from .layered import LayeredCircuit, _SENTINEL_EMPTY


@dataclass
class CompiledLayer:
    size: int
    bit_length: int
    padded: int
    # gathers (length = size) — HOST numpy: converting a device array back
    # with np.asarray does a device->host transfer, and on the axon remote
    # backend ONE such transfer permanently degrades every later dispatch
    # to a synchronous ~6ms tunnel round trip (measured).  Device copies are
    # made once in eval_arrays()/circuit_arrays() and passed as jit args.
    x_idx: np.ndarray             # int32, into previous layer's padded block
    y_idx: np.ndarray             # int32, global into value buffer
    coeff: np.ndarray             # uint64 (4 coeffs, 2 comps, size)
    is_assert: Optional[np.ndarray]
    has_assert: bool
    # phase-2 scatter: per gate, flat index into concat dad buffer (unary
    # gates scatter to the synthetic (i-1, 0) slot per prover.cpp:314)
    dad_sizes: List[int]          # per source layer l in [0, i)
    dad_bls: List[int]            # -inf sentinel for empty
    dad_offsets: List[int]        # offsets into the concat dad buffer
    dad_padded_total: int
    p2_flat_idx: Optional[jnp.ndarray]   # int32 per gate
    dad_gather_idx: Optional[jnp.ndarray]  # int32: global value index per dad slot (to init V tables); -1 padding
    max_dad_bit_length: int
    # Liu: for each HIGHER layer j > this one is consumer; built separately


@dataclass
class CompiledCircuit:
    layers: List[CompiledLayer]
    value_off: np.ndarray         # int64 per layer
    total_values: int
    max_bl: int
    n_inputs: int
    input_bl: int
    # dad_of[j][l]: the dad_id array of layer j into source layer l (numpy)
    source: LayeredCircuit

    @property
    def depth(self) -> int:
        return len(self.layers)


def _coeff_planes(L) -> np.ndarray:
    (Ar, Ai), (Br, Bi), (Cr, Ci), (Dr, Di) = coeff_tables(L.ty, L.c_real, L.c_img)
    out = np.zeros((4, 2, L.size), dtype=np.uint64)
    for k, (r, i) in enumerate(((Ar, Ai), (Br, Bi), (Cr, Ci), (Dr, Di))):
        out[k, 0] = r
        out[k, 1] = i
    return out


def compile_circuit(c: LayeredCircuit) -> CompiledCircuit:
    n_layers = c.size
    padded = [1 << L.bit_length for L in c.layers]
    value_off = np.zeros(n_layers, dtype=np.int64)
    for i in range(1, n_layers):
        value_off[i] = value_off[i - 1] + padded[i - 1]
    total_values = int(value_off[-1] + padded[-1])

    layers: List[CompiledLayer] = []
    max_bl = max(L.bit_length for L in c.layers)

    for i, L in enumerate(c.layers):
        if i == 0:
            layers.append(CompiledLayer(
                size=L.size, bit_length=L.bit_length, padded=padded[0],
                x_idx=None, y_idx=None, coeff=None,
                is_assert=None, has_assert=False,
                dad_sizes=[], dad_bls=[], dad_offsets=[],
                dad_padded_total=0, p2_flat_idx=None, dad_gather_idx=None,
                max_dad_bit_length=-1))
            continue

        x_idx = L.u.astype(np.int32)
        unary = L.l < 0
        src_l = np.where(unary, i - 1, L.l).astype(np.int64)
        y_idx = (value_off[src_l] + np.where(unary, 0, L.v)).astype(np.int32)

        # phase-2 concat dad buffer: per source layer l in [0, i) a padded
        # block of 2^dad_bl (empty layers get the reference's synthetic
        # 1-entry zero table — circuit.cpp INT_MIN shift quirk makes
        # total==1 there, see SURVEY §2.1 analysis).
        dad_sizes, dad_bls, dad_offsets = [], [], []
        off = 0
        for l in range(i):
            ds = L.dad_size[l]
            bl = L.dad_bit_length[l]
            dad_sizes.append(int(ds))
            dad_bls.append(int(bl))
            dad_offsets.append(off)
            off += (1 << bl) if ds > 0 else 1
        dad_padded_total = off

        p2_flat = None
        dad_gather = None
        if L.max_dad_bit_length >= 0:
            offs = np.array(dad_offsets + [0], dtype=np.int64)  # dummy tail
            tgt_l = np.where(unary, i - 1, L.l).astype(np.int64)
            tgt_lv = np.where(unary, 0, L.lv)
            p2_flat = (offs[tgt_l] + tgt_lv).astype(np.int32)
            # dad gather: for each slot in concat dad buffer, the global
            # value index it reads (prover.cpp:303), -1 for padding slots
            dg = np.full(dad_padded_total, -1, dtype=np.int64)
            for l in range(i):
                ds = L.dad_size[l]
                if ds > 0:
                    dg[dad_offsets[l]:dad_offsets[l] + ds] = (
                        value_off[l] + L.dad_id[l])
            dad_gather = dg.astype(np.int32)

        layers.append(CompiledLayer(
            size=L.size, bit_length=L.bit_length, padded=padded[i],
            x_idx=x_idx, y_idx=y_idx,
            coeff=_coeff_planes(L),
            is_assert=L.is_assert if L.is_assert.any() else None,
            has_assert=bool(L.is_assert.any()),
            dad_sizes=dad_sizes, dad_bls=dad_bls, dad_offsets=dad_offsets,
            dad_padded_total=dad_padded_total,
            p2_flat_idx=p2_flat,
            dad_gather_idx=dad_gather,
            max_dad_bit_length=L.max_dad_bit_length))

    return CompiledCircuit(
        layers=layers, value_off=value_off, total_values=total_values,
        max_bl=max_bl, n_inputs=c.layers[0].size,
        input_bl=c.layers[0].bit_length, source=c)


def input_buffer(cc: CompiledCircuit, witness: Optional[np.ndarray] = None):
    """(2, 2^input_bl) uint64 padded input-layer values."""
    if witness is None:
        witness = cc.source.input_values
    vals = np.zeros((2, cc.layers[0].padded), dtype=np.uint64)
    vals[:, :witness.shape[1]] = witness
    return gf.from_u64(vals[0], vals[1])


def eval_arrays(cc: CompiledCircuit) -> dict:
    """Gather/coefficient arrays as a pytree (passed as jit arguments so
    they are parameters, not multi-MB inline constants)."""
    return {f"x{i}": jnp.asarray(cc.layers[i].x_idx)
            for i in range(1, cc.depth)} | \
           {f"y{i}": jnp.asarray(cc.layers[i].y_idx)
            for i in range(1, cc.depth)} | \
           {f"co{i}": jnp.asarray(cc.layers[i].coeff)
            for i in range(1, cc.depth)}


def evaluate(cc: CompiledCircuit, inputs, arrs=None):
    """Forward pass: returns the concatenated (2, total_values) buffer.

    TPU shape: per layer, two gathers + fused A*x + B*y + C*x*y + D, written
    into a preallocated buffer (XLA reuses it in place inside jit).
    """
    if arrs is None:
        arrs = eval_arrays(cc)
    values = jnp.zeros((2, cc.total_values), dtype=jnp.uint64)
    values = jax.lax.dynamic_update_slice(values, inputs, (0, 0))
    for i in range(1, cc.depth):
        L = cc.layers[i]
        x = values[:, int(cc.value_off[i - 1]) + arrs[f"x{i}"]]
        y = values[:, arrs[f"y{i}"]]
        co = arrs[f"co{i}"]
        A, B, C, D = co[0], co[1], co[2], co[3]
        out = gf.add(gf.add(gf.mul(A, x), gf.mul(B, y)),
                     gf.add(gf.mul(C, gf.mul(x, y)), D))
        if L.padded > L.size:
            out = jnp.pad(out, ((0, 0), (0, L.padded - L.size)))
        values = jax.lax.dynamic_update_slice(values, out,
                                              (0, int(cc.value_off[i])))
    return values
