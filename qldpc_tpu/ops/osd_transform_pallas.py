"""Pallas TPU kernel for the transform-based GF(2) elimination (wide OSD).

Wide systems (circuit-level DEMs: 432 x 15765) use the TRANSFORM
elimination (decoders/osd.py::_eliminate_lanes_T): carry the m x m
row-operation transform T instead of the full packed system, computing
RREF column bits on demand as parity(T & H[:, col]). Under XLA that loop
round-trips T (m x m_words x B, ~25 MB at B=1024) through HBM on every one
of its ~rank(H) column steps — ~10 HBM passes per column, ~1.3 s per
1024-lane batch on v5e.

This kernel keeps a 128-lane tile of T ((432, 14, 128) uint32 = 3.1 MB)
VMEM-RESIDENT for the whole elimination and streams the per-lane permuted
packed columns (pre-gathered by XLA as word-planes, so no in-kernel
gathers) in chunks along a second grid axis. Per column step everything is
(m, m_words, bt) elementwise XOR/AND plus row reductions — the same masked
first-hit-pivot algorithm as the XLA path, bit-for-bit (popcount-free
parity via shift-XOR folds; one-hot row selection via the row-index
min-reduction of ops/osd_pallas.py). A whole-tile SMEM flag skips the
remaining column chunks once every lane has found rank(H) pivots.

Outputs (T, b, rank, piv_col) are bit-identical to _eliminate_lanes_T
(tests/test_osd_transform_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["eliminate_transform_pallas"]


def _kernel(
    hcp_ref,  # (mw, CC, bt) permuted packed H columns of this chunk
    b_in_ref,  # (m, bt) uint32 residual syndrome bits
    t0_ref,  # (m, mw) packed identity
    # the outputs double as the elimination STATE: their block index maps
    # ignore the column-chunk grid axis, so Mosaic keeps one resident
    # buffer per lane tile that persists across chunks (the accumulation
    # pattern) — no separate scratch copies, which would not fit VMEM
    t_ref,  # out/state (m, mw, bt)
    b_ref,  # out/state (m, bt)
    rank_ref,  # out/state (1, bt) int32
    piv_ref,  # out/state (m, bt) int32
    done_ref,  # SMEM scratch (1,) int32
    *,
    m: int,
    mw: int,
    cc: int,
    bt: int,
    n: int,
    h_rank: int,
    b_exit: bool,
):
    j = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, bt), 0)

    @pl.when(j == 0)
    def _init():
        t_ref[:] = jnp.broadcast_to(t0_ref[:][:, :, None], (m, mw, bt))
        b_ref[:] = b_in_ref[:]
        rank_ref[:] = jnp.zeros((1, bt), jnp.int32)
        piv_ref[:] = jnp.full((m, bt), -1, jnp.int32)
        done_ref[0] = 0

    def select_sum(vals, mask, axis):
        # exact one-hot masked uint32 reduction via int32 bitcast
        # (Mosaic lowers no unsigned reductions — ops/osd_pallas.py)
        vi = jax.lax.bitcast_convert_type(vals, jnp.int32)
        s = jnp.sum(jnp.where(mask, vi, 0), axis=axis, dtype=jnp.int32)
        return jax.lax.bitcast_convert_type(s, jnp.uint32)

    @pl.when(done_ref[0] == 0)
    def _chunk():
        def step(i, rank):
            col = j * cc + i
            T = t_ref[:]
            b = b_ref[:]
            hc = hcp_ref[:, i, :]  # (mw, bt)

            # parity(T_row & hcol): XOR-fold the words, then the 32 bits
            z = T[:, 0, :] & hc[0, :][None, :]
            for w in range(1, mw):
                z = z ^ (T[:, w, :] & hc[w, :][None, :])
            z = z ^ (z >> jnp.uint32(16))
            z = z ^ (z >> jnp.uint32(8))
            z = z ^ (z >> jnp.uint32(4))
            z = z ^ (z >> jnp.uint32(2))
            z = z ^ (z >> jnp.uint32(1))
            bits = z & jnp.uint32(1)  # (m, bt)

            cand = (bits == 1) & (row_ids >= rank) & (col < n)
            idx = jnp.min(jnp.where(cand, row_ids, m), axis=0, keepdims=True)
            has = idx < m  # (1, bt)
            oh_p = row_ids == idx
            oh_r = row_ids == rank

            au = lambda x: x.astype(jnp.uint32)
            pivrow = select_sum(T, oh_p[:, None, :], axis=0)  # (mw, bt)
            rankrow = select_sum(T, oh_r[:, None, :], axis=0)
            diff = pivrow ^ rankrow
            swap = au((oh_p ^ oh_r) & has)
            T = T ^ (swap[:, None, :] * diff[None, :, :])
            pb = select_sum(b, oh_p, axis=0)
            rb = select_sum(b, oh_r, axis=0)
            b = b ^ (swap * (pb ^ rb)[None, :])

            # column bits after the swap: rows p and r exchanged
            bits_p = select_sum(bits, oh_p, axis=0)
            bits_r = select_sum(bits, oh_r, axis=0)
            bits2 = jnp.where(oh_p, bits_r[None, :], bits)
            bits2 = jnp.where(oh_r, bits_p[None, :], bits2)

            elim = au((bits2 == 1) & ~oh_r & has)
            newpiv = select_sum(T, oh_r[:, None, :], axis=0)
            newpb = select_sum(b, oh_r, axis=0)
            t_ref[:] = T ^ (elim[:, None, :] * newpiv[None, :, :])
            b_ref[:] = b ^ (elim * newpb[None, :])

            piv_ref[:] = jnp.where(oh_r & has, col, piv_ref[:])
            return rank + has.astype(jnp.int32)

        rank = jax.lax.fori_loop(0, cc, step, rank_ref[:])
        rank_ref[:] = rank
        lane_done = rank >= h_rank  # (1, bt)
        if b_exit:
            # b-exit (exact for every OSD order): once a lane's unresolved
            # rows (>= rank) carry no syndrome bit, every future pivot row
            # gets b = 0 and contributes nothing to the solution. A b-exited
            # lane is consistent, so OSD-e's early return applies and its
            # pattern search never reads this lane's T; inconsistent lanes
            # keep an unresolved bit forever and still run to rank(H).
            bi = jax.lax.bitcast_convert_type(b_ref[:], jnp.int32)
            unres = jnp.max(
                jnp.where(row_ids >= rank, bi, 0), axis=0, keepdims=True
            )
            lane_done = lane_done | (unres == 0)
        done_ref[0] = jnp.min(lane_done.astype(jnp.int32))


def eliminate_transform_pallas(
    hcp: jax.Array,  # (mw, n_cols_pad, B) uint32 permuted packed columns
    b: jax.Array,  # (m, B) uint32
    t0: jax.Array,  # (m, mw) uint32 packed identity
    *,
    n: int,
    h_rank: int,
    b_exit: bool = False,
    col_chunk: int = 128,
    batch_tile: int = 128,
    interpret: bool = False,
):
    """Batched transform-based GF(2) RREF, batch in lanes.

    Returns (T (m, mw, B), b (m, B), rank (1, B) int32, piv_col (m, B)
    int32), bit-identical to decoders/osd.py::_eliminate_lanes_T. ``hcp``
    must be padded to a ``col_chunk`` multiple of columns and ``B`` to a
    ``batch_tile`` multiple (callers pad; padded columns are ignored via
    the ``col < n`` guard, padded lanes eliminate garbage and are sliced
    away by the caller).
    """
    mw, n_pad, B = hcp.shape
    m = b.shape[0]
    if n_pad % col_chunk or B % batch_tile:
        raise ValueError("hcp columns / batch must be padded to multiples")
    kernel = functools.partial(
        _kernel, m=m, mw=mw, cc=col_chunk, bt=batch_tile, n=n,
        h_rank=h_rank, b_exit=b_exit,
    )
    lane = lambda *dims: pl.BlockSpec(
        dims, (lambda i, j: (0, i) if len(dims) == 2 else (0, 0, i)),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // batch_tile, n_pad // col_chunk),
        in_specs=[
            pl.BlockSpec(
                (mw, col_chunk, batch_tile),
                lambda i, j: (0, j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((m, batch_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, mw), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            lane(m, mw, batch_tile),
            lane(m, batch_tile),
            lane(1, batch_tile),
            lane(m, batch_tile),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, mw, B), jnp.uint32),
            jax.ShapeDtypeStruct((m, B), jnp.uint32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((m, B), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(hcp, b, t0)
