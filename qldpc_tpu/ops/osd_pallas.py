"""Pallas TPU kernel for the OSD GF(2) elimination (experimental).

The lanes-backend elimination (decoders/osd.py::_eliminate_lanes) re-reads
the packed system from HBM on every one of its n column steps under XLA.
This kernel keeps the whole packed system — (m, n_words, BT) uint32, under
1 MiB for the BB codes at BT = 512 — resident in VMEM for the entire
elimination, with the same batch-in-lanes masked algorithm:

  * first-hit pivot selection per lane via a row-index min-reduction
    (no cumsum: idx = min over rows of where(candidate, row, m));
  * masked XOR row swap and masked elimination, all (m, n_words, BT)
    elementwise ops + reductions over the row axis.

Status: compiled and validated bit-identical to the XLA lanes path on real
TPU (v5e). At the Monte-Carlo engine's compaction tier sizes it is 3-10x
faster per batch than the XLA elimination ([[144,12,12]]: 1.4ms vs 14.4ms
at 128 lanes, 3.9ms vs 13.1ms at 1024), because the packed system stays
VMEM-resident across all n column steps instead of round-tripping HBM.
OSDConfig(backend="auto") picks it on TPU whenever the tile fits VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["eliminate_pallas"]

_WORD = 32


def _elim_kernel(a_in, b_in, a_out, b_out, piv_out, *, m, nw, n, bt):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, bt), 0)
    word_ids = jax.lax.broadcasted_iota(jnp.int32, (m, nw, bt), 1)

    a_out[:] = a_in[:]
    b_out[:] = b_in[:]
    piv_out[:] = jnp.full((m, bt), -1, jnp.int32)
    # rank per lane, carried through the loop as a functional value
    rank0 = jnp.zeros((1, bt), jnp.int32)

    def select_sum(vals, mask, axis):
        # one-hot masked reduction of uint32 values. Mosaic lowers neither
        # dynamic_slice on values nor unsigned reductions, so route the sum
        # (exact: zeros plus one selected word) through an int32 bitcast.
        vi = jax.lax.bitcast_convert_type(vals, jnp.int32)
        s = jnp.sum(jnp.where(mask, vi, 0), axis=axis, dtype=jnp.int32)
        return jax.lax.bitcast_convert_type(s, jnp.uint32)

    def extract_word(A, w):
        # select word w of every packed row (static word axis)
        return select_sum(A, word_ids == w, axis=1)

    def step(col, rank):
        w = col // _WORD
        bit = (col % _WORD).astype(jnp.uint32)
        A = a_out[:]  # (m, nw, bt)
        b = b_out[:]
        word = extract_word(A, w)
        bits = (word >> bit) & 1  # (m, bt)

        cand = (bits == 1) & (row_ids >= rank)
        idx = jnp.min(jnp.where(cand, row_ids, m), axis=0, keepdims=True)  # (1, bt)
        has = idx < m
        oh_p = row_ids == idx  # (m, bt); all-false when no pivot (idx == m)
        oh_r = row_ids == rank

        au = lambda x: x.astype(jnp.uint32)
        pivrow = select_sum(A, oh_p[:, None, :], axis=0)
        rankrow = select_sum(A, oh_r[:, None, :], axis=0)
        diff = pivrow ^ rankrow
        swap = au((oh_p ^ oh_r) & has)
        A = A ^ (swap[:, None, :] * diff[None, :, :])
        pb = select_sum(b, oh_p, axis=0)
        rb = select_sum(b, oh_r, axis=0)
        b = b ^ (swap * (pb ^ rb)[None, :])

        word2 = extract_word(A, w)
        bits2 = (word2 >> bit) & 1
        elim = au((bits2 == 1) & ~oh_r & has)
        newpiv = select_sum(A, oh_r[:, None, :], axis=0)
        newpb = select_sum(b, oh_r, axis=0)
        A = A ^ (elim[:, None, :] * newpiv[None, :, :])
        b = b ^ (elim * newpb[None, :])

        a_out[:] = A
        b_out[:] = b
        piv_out[:] = jnp.where(oh_r & has, col, piv_out[:])
        return rank + (has & jnp.full((1, bt), True)).astype(jnp.int32)

    jax.lax.fori_loop(0, n, step, rank0)


def eliminate_pallas(
    A: jax.Array, b: jax.Array, n: int, batch_tile: int = 512, interpret: bool = False
):
    """Full GF(2) RREF of a packed batch, batch in lanes.

    A (m, n_words, B) uint32, b (m, B) uint32; n = logical column count.
    Returns (A_rref, b_rref, piv_col (m, B) int32). B must be a multiple of
    batch_tile (callers pad).
    """
    m, nw, B = A.shape
    if B % batch_tile:
        raise ValueError(f"batch {B} not a multiple of tile {batch_tile}")
    n_tiles = B // batch_tile

    kernel = functools.partial(
        _elim_kernel, m=m, nw=nw, n=n, bt=batch_tile
    )
    tile3 = pl.BlockSpec((m, nw, batch_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    tile2 = pl.BlockSpec((m, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[tile3, tile2],
        out_specs=(tile3, tile2, tile2),
        out_shape=(
            jax.ShapeDtypeStruct((m, nw, B), jnp.uint32),
            jax.ShapeDtypeStruct((m, B), jnp.uint32),
            jax.ShapeDtypeStruct((m, B), jnp.int32),
        ),
        # the RREF overwrites the input system in place (the kernel's first
        # statement copies in -> out); aliasing halves the HBM/VMEM footprint
        # at large batches
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(A, b)
