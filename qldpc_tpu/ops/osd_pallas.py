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

Status: validated against the XLA lanes path in interpret mode (CPU tests);
real-TPU compilation is a round-2 item (ROADMAP.md) — the decoder keeps the
XLA lanes backend as its default.
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

    a_out[:] = a_in[:]
    b_out[:] = b_in[:]
    piv_out[:] = jnp.full((m, bt), -1, jnp.int32)
    # rank per lane, carried through the loop as a functional value
    rank0 = jnp.zeros((1, bt), jnp.int32)

    def step(col, rank):
        w = col // _WORD
        bit = (col % _WORD).astype(jnp.uint32)
        A = a_out[:]  # (m, nw, bt)
        b = b_out[:]
        word = jax.lax.dynamic_index_in_dim(A, w, axis=1, keepdims=False)
        bits = (word >> bit) & 1  # (m, bt)

        cand = (bits == 1) & (row_ids >= rank)
        idx = jnp.min(jnp.where(cand, row_ids, m), axis=0, keepdims=True)  # (1, bt)
        has = idx < m
        oh_p = row_ids == idx  # (m, bt); all-false when no pivot (idx == m)
        oh_r = row_ids == rank

        au = lambda x: x.astype(jnp.uint32)
        pivrow = jnp.sum(A * au(oh_p)[:, None, :], axis=0, dtype=jnp.uint32)
        rankrow = jnp.sum(A * au(oh_r)[:, None, :], axis=0, dtype=jnp.uint32)
        diff = pivrow ^ rankrow
        swap = au((oh_p ^ oh_r) & has)
        A = A ^ (swap[:, None, :] * diff[None, :, :])
        pb = jnp.sum(b * au(oh_p), axis=0, dtype=jnp.uint32)
        rb = jnp.sum(b * au(oh_r), axis=0, dtype=jnp.uint32)
        b = b ^ (swap * (pb ^ rb)[None, :])

        word2 = jax.lax.dynamic_index_in_dim(A, w, axis=1, keepdims=False)
        bits2 = (word2 >> bit) & 1
        elim = au((bits2 == 1) & ~oh_r & has)
        newpiv = jnp.sum(A * au(oh_r)[:, None, :], axis=0, dtype=jnp.uint32)
        newpb = jnp.sum(b * au(oh_r), axis=0, dtype=jnp.uint32)
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
        interpret=interpret,
    )(A, b)
