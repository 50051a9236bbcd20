"""Factored (delayed-update) GF(2) elimination for DEM-scale wide OSD.

The transform elimination (decoders/osd.py::_eliminate_lanes_T and its
VMEM-resident kernel, ops/osd_transform_pallas.py) carries the m x m row-op
transform T per lane. A [[144,12,12]] circuit DEM has m = 1728 detectors:
T is 373 KB *per lane* (47.8 MB per 128-lane tile) — far past VMEM — so the
kernel refuses it and the XLA path round-trips T through HBM ~10x per column
step (~18 s per 512-lane batch, the round-3 bottleneck: docs/circuit_ler.md).

This module never materializes T. It exploits the algebra of the
elimination: every row operation ever performed is "row r ^= (pivot-time
value of pivot s)", so after any number of steps

    T[r] = e_r  ^  XOR_{s : C[r,s]=1} P[s]

with  P[s] = the s-th pivot row's T-value at its own pivot time (frozen) and
C[r,s] = 1 iff row r was ever eliminated by pivot s. Columns are processed
in blocks of K: the current RREF bits of a block are reconstructed as

    W = H_blk  ^  C @ (P @ H_blk)        (all products mod 2)

then a K-step panel elimination runs entirely in VMEM on [W | b], recording
the block's new coefficients C_new and pivot rows, and the new pivot T-rows
are resolved from (P, C, C_new) — no per-column pass over any m x m state.
Pivot selection is *implicit* (first un-pivoted row, no physical swaps):
the pivot column set and the reduced syndrome b at the pivots — the only
outputs OSD consumes — are invariant to pivot-row choice (the RREF of
[H_perm | b] is canonical), so decisions match the transform paths
bit-for-bit at the solution level (tests/test_osd_factored.py).

Block loop placement: XLA `while_loop` hosts the loop (per-lane combined
b-exit/rank-exit condition, exactly decoders/osd.py::_eliminate_lanes_T's),
XLA does the per-lane column gathers (measured-fast batch-minor row gathers;
Mosaic cannot gather) and the P/C appends; four small Pallas kernels do the
VMEM-resident math. HBM traffic per block is one streamed pass over P (x2)
and C (x1) plus K-column gathers — vs the XLA transform path's ~10 passes
over T *per column*.

Reference workload: studies/studyComplete.py:99-104 at [[144,12,12]] /
[[288,12,18]] scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FactoredEliminator"]

_WORD = 32


def _round_up(x: int, k: int) -> int:
    return -(-x // k) * k


def _select_sum(vals, mask, axis=0):
    """Exact one-hot masked uint32 reduction via int32 bitcast (Mosaic
    lowers no unsigned reductions — ops/osd_pallas.py)."""
    vi = jax.lax.bitcast_convert_type(vals, jnp.int32)
    s = jnp.sum(jnp.where(mask, vi, 0), axis=axis, keepdims=True,
                dtype=jnp.int32)
    return jax.lax.bitcast_convert_type(s, jnp.uint32)


def _parity32(z):
    """Bitwise parity of every uint32 lane -> {0,1} uint32."""
    z = z ^ (z >> jnp.uint32(16))
    z = z ^ (z >> jnp.uint32(8))
    z = z ^ (z >> jnp.uint32(4))
    z = z ^ (z >> jnp.uint32(2))
    z = z ^ (z >> jnp.uint32(1))
    return z & jnp.uint32(1)


# --------------------------------------------------------------------------
# kernel 1: Y = P @ H_blk   (per-pivot parity of every block column)
# --------------------------------------------------------------------------
def _y_kernel(scur_ref, p_ref, hblk_ref, y_ref, *, sp, mw, kw, bt):
    s_base = pl.program_id(1) * sp

    @pl.when(s_base >= scur_ref[0])
    def _zero():
        y_ref[:] = jnp.zeros((sp, kw, bt), jnp.uint32)

    @pl.when(s_base < scur_ref[0])
    def _compute():
        for w in range(kw):
            def bit_step(i2, word):
                k = w * _WORD + i2
                hc = hblk_ref[k]  # (mw, bt)
                z = p_ref[:, 0, :] & hc[0][None, :]
                for ww in range(1, mw):
                    z = z ^ (p_ref[:, ww, :] & hc[ww][None, :])
                bit = _parity32(z)  # (sp, bt)
                return word ^ (bit << i2.astype(jnp.uint32))

            y_ref[:, w, :] = jax.lax.fori_loop(
                0, _WORD, bit_step, jnp.zeros((sp, bt), jnp.uint32)
            )


# --------------------------------------------------------------------------
# kernel 2: W = H_blk_bits ^ C @ Y   (current RREF bits of the block)
# --------------------------------------------------------------------------
def _w_kernel(scur_ref, c_ref, y_ref, hb_ref, w_ref, *, mp, kw, bt, cwp):
    # hb_ref: (mpw, K, bt) — this row-panel's H words, word-major so the
    # panel slice lands on the (unconstrained) leading block dim.
    # c_ref: (mp, cwp, bt) — ONE cwp-word panel of this row-panel's C
    # (the full (mp, cw, bt) block blows VMEM at [[288]] DEM scale where
    # cw ~ 190); the grid's last (fastest) axis walks the panels and the
    # output block accumulates across them.
    mpw = mp // _WORD
    c_idx = pl.program_id(2)

    @pl.when(c_idx == 0)
    def _init():
        # unpack this row-panel's H bits, re-packed along the column axis
        words = []
        for w in range(kw):
            def bit_step(i2, word):
                k = w * _WORD + i2
                hw = hb_ref[:, k, :]  # (mpw, bt) row-words of column k
                bits = (
                    jnp.broadcast_to(hw[:, None, :], (mpw, _WORD, bt))
                    >> jax.lax.broadcasted_iota(
                        jnp.uint32, (mpw, _WORD, bt), 1
                    )
                ) & jnp.uint32(1)
                bits = bits.reshape(mp, bt)
                return word ^ (bits << i2.astype(jnp.uint32))

            words.append(
                jax.lax.fori_loop(0, _WORD, bit_step,
                                  jnp.zeros((mp, bt), jnp.uint32))[:, None, :]
            )
        w_ref[:] = jnp.concatenate(words, axis=1)  # (mp, kw, bt)

    # C @ Y over this panel's words: 32 statically-unrolled bit terms per
    # word (rows of Y past scur are zero, so word-granular overshoot
    # contributes nothing)
    def word_step(swl, acc):
        cm = c_ref[:, swl, :]  # (mp, bt)
        for i3 in range(_WORD):
            mask = (cm >> jnp.uint32(i3)) & jnp.uint32(1)
            y = y_ref[(c_idx * cwp + swl) * _WORD + i3]  # (kw, bt)
            acc = acc ^ (mask[:, None, :] * y[None, :, :])
        return acc

    n_words = (scur_ref[0] + _WORD - 1) // _WORD
    n_loc = jnp.clip(n_words - c_idx * cwp, 0, cwp)
    w_ref[:] = jax.lax.fori_loop(0, n_loc, word_step, w_ref[:])


# --------------------------------------------------------------------------
# kernel 3: VMEM-resident K-column panel elimination on [W | b]
# --------------------------------------------------------------------------
def _pack_rows(bits, epw, bt):
    """Pack a {0,1} (epw*32, bt) plane into (epw, bt) uint32 row-words.
    Bits are disjoint per word, so the int32-bitcast sum is an exact OR
    (Mosaic lowers no unsigned reductions)."""
    b3 = bits.reshape(epw, _WORD, bt) << jax.lax.broadcasted_iota(
        jnp.uint32, (epw, _WORD, bt), 1
    )
    vi = jax.lax.bitcast_convert_type(b3, jnp.int32)
    return jax.lax.bitcast_convert_type(
        jnp.sum(vi, axis=1, dtype=jnp.int32), jnp.uint32
    )


def _unpack_rows(words, ep, bt):
    """(ep//32, bt) uint32 row-words -> {0,1} (ep, bt) uint32 plane."""
    epw = ep // _WORD
    iota = jax.lax.broadcasted_iota(jnp.uint32, (epw, _WORD, bt), 1)
    return ((words[:, None, :] >> iota) & jnp.uint32(1)).reshape(ep, bt)


def _elim_kernel(
    ids_ref,  # (K, bt) int32 original column ids (n sentinel on padding)
    w_hbm,    # (m_pad, kw, bt) uint32 — stays in HBM, DMA'd to scratch
    b_in,     # (mw, B) row-PACKED reduced syndrome (bit r of word r//32)
    piv_in,   # (mw, B) row-packed pivoted-row flags
    b_out,    # out (mw, B) in HBM — working state lives in scratch and is
    piv_out,  # DMA'd out once after the column loop (VMEM out blocks and
    #           unpacked (m_pad, bt) row planes both blow the ~16 MB scoped
    #           VMEM stack at [[288]] DEM scale: 18.62 MB measured)
    cnew_hbm,  # out (m_pad, kw, bt) in HBM — written word-by-word via DMA
    prow_ref,  # out (K, bt) int32, m_pad sentinel where no pivot
    w_io,     # VMEM scratch (m_pad, kw, bt) — the only W copy on chip
    b_io,     # VMEM scratch (mw, bt) — packed working reduced syndrome
    piv_io,   # VMEM scratch (mw, bt) — packed pivoted-row flags
    cw_scr,   # VMEM scratch (m_pad, bt) — current coefficient word
    w_sem,
    c_sem,
    *,
    m_pad: int,
    kw: int,
    bt: int,
    n: int,
    ep: int,  # row-panel height (multiple of 32): bounds one column step's
    # live temps, which otherwise scale as several (m_pad, bt) arrays and
    # blow the Mosaic VMEM stack past ~1.5k rows (measured at [[144]] scale)
):
    K = kw * _WORD
    NP = m_pad // ep
    epw = ep // _WORD
    i = pl.program_id(0)
    lanes = pl.ds(i * bt, bt)
    dma = pltpu.make_async_copy(w_hbm.at[:, :, lanes], w_io, w_sem)
    dma.start()
    dma_b = pltpu.make_async_copy(b_in.at[:, lanes], b_io, c_sem)
    dma_b.start()
    dma_b.wait()
    dma_p = pltpu.make_async_copy(piv_in.at[:, lanes], piv_io, c_sem)
    dma_p.start()
    dma_p.wait()
    dma.wait()
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (K, bt), 0)
    prow = jnp.full((K, bt), m_pad, jnp.int32)
    rid_p = jax.lax.broadcasted_iota(jnp.int32, (ep, bt), 0)
    rid_w = jax.lax.broadcasted_iota(jnp.int32, (epw, bt), 0)

    for w in range(kw):
        cw_scr[:] = jnp.zeros((m_pad, bt), jnp.uint32)

        def bit_step(i2, prow):
            j = w * _WORD + i2
            i2u = i2.astype(jnp.uint32)
            valid_col = ids_ref[j][None, :] < n  # (1, bt)

            # pass A: global first-candidate row (min over row panels)
            idx = jnp.full((1, bt), m_pad, jnp.int32)
            for p in range(NP):
                r0, r0w = p * ep, p * epw
                bits = (w_io[r0:r0 + ep, w, :] >> i2u) & jnp.uint32(1)
                pbits = _unpack_rows(piv_io[r0w:r0w + epw, :], ep, bt)
                cand = (bits == 1) & (pbits == 0) & valid_col
                idx = jnp.minimum(
                    idx,
                    jnp.min(jnp.where(cand, rid_p + r0, m_pad), axis=0,
                            keepdims=True),
                )
            has = idx < m_pad

            # pass B: pivot row's W words + b bit (exactly one panel hits)
            idx_w = jax.lax.shift_right_logical(
                idx, jnp.int32(5)
            )  # pivot's row-word
            bw_sel = jnp.zeros((1, bt), jnp.uint32)
            wps = [jnp.zeros((1, bt), jnp.uint32) for _ in range(kw)]
            for p in range(NP):
                r0, r0w = p * ep, p * epw
                oh = (rid_p + r0) == idx
                ohw = (rid_w + r0w) == idx_w
                bw_sel = bw_sel ^ _select_sum(b_io[r0w:r0w + epw, :], ohw)
                for ww in range(kw):
                    wps[ww] = wps[ww] ^ _select_sum(
                        w_io[r0:r0 + ep, ww, :], oh
                    )
            bp = (
                bw_sel >> (idx & 31).astype(jnp.uint32)
            ) & jnp.uint32(1)  # (1, bt); no-pivot lanes select word 0 ^ 0

            # pass C: eliminate the bit everywhere else
            for p in range(NP):
                r0, r0w = p * ep, p * epw
                bits = (w_io[r0:r0 + ep, w, :] >> i2u) & jnp.uint32(1)
                oh = (rid_p + r0) == idx
                elim = ((bits == 1) & ~oh & has).astype(jnp.uint32)
                for ww in range(kw):
                    w_io[r0:r0 + ep, ww, :] = (
                        w_io[r0:r0 + ep, ww, :] ^ (elim * wps[ww])
                    )
                b_io[r0w:r0w + epw, :] = b_io[r0w:r0w + epw, :] ^ _pack_rows(
                    elim * bp, epw, bt
                )
                piv_io[r0w:r0w + epw, :] = piv_io[
                    r0w:r0w + epw, :
                ] | _pack_rows((oh & has).astype(jnp.uint32), epw, bt)
                cw_scr[r0:r0 + ep, :] = cw_scr[r0:r0 + ep, :] ^ (elim << i2u)

            return jnp.where(k_iota == j, idx, prow)

        prow = jax.lax.fori_loop(0, _WORD, bit_step, prow)
        out_dma = pltpu.make_async_copy(
            cw_scr, cnew_hbm.at[:, w, pl.ds(i * bt, bt)], c_sem
        )
        out_dma.start()
        out_dma.wait()

    prow_ref[:] = prow
    dma_bo = pltpu.make_async_copy(b_io, b_out.at[:, lanes], c_sem)
    dma_bo.start()
    dma_bo.wait()
    dma_po = pltpu.make_async_copy(piv_io, piv_out.at[:, lanes], w_sem)
    dma_po.start()
    dma_po.wait()


# --------------------------------------------------------------------------
# kernel 4: resolve the block's pivot T-rows  Pnew = e_p ^ G@P ^ D@Pnew
# --------------------------------------------------------------------------
def _resolve_kernel(
    scur_ref,
    p_ref,    # (SP, mw, bt) streamed panel of P
    g_ref,    # (K, cw, bt) gathered C rows of the pivots (masked invalid)
    d_ref,    # (K, kw, bt) gathered C_new rows (intra-block coefficients)
    prow_ref,  # (K, bt) int32
    pnew_ref,  # out (K, mw, bt), accumulated across the panel grid axis
    *,
    sp: int,
    mw: int,
    kw: int,
    bt: int,
    K: int,
):
    s_base = pl.program_id(1) * sp
    last = pl.num_programs(1) - 1

    @pl.when(pl.program_id(1) == 0)
    def _init():
        pnew_ref[:] = jnp.zeros((K, mw, bt), jnp.uint32)

    @pl.when(s_base < scur_ref[0])
    def _acc():
        def s_step(sl, acc):
            s = s_base + sl
            gw = g_ref[:, s // _WORD, :]  # (K, bt)
            mask = (gw >> (s % _WORD).astype(jnp.uint32)) & jnp.uint32(1)
            pv = p_ref[sl]  # (mw, bt)
            return acc ^ (mask[:, None, :] * pv[None, :, :])

        n_loc = jnp.clip(scur_ref[0] - s_base, 0, sp)
        pnew_ref[:] = jax.lax.fori_loop(0, n_loc, s_step, pnew_ref[:])

    @pl.when(pl.program_id(1) == last)
    def _finish():
        # e_{p_j}: one bit at the pivot's own row, applied word-by-word to
        # keep live temporaries at (K, bt) (sentinel m_pad lands in word
        # m_pad//32 == mw, beyond every real word -> no contribution)
        pr = prow_ref[:]  # (K, bt) int32
        prw = pr >> 5
        prb = (pr & 31).astype(jnp.uint32)
        for w in range(mw):
            ew = (prw == w).astype(jnp.uint32) << prb
            pnew_ref[:, w, :] = pnew_ref[:, w, :] ^ ew
        # intra-block resolve in pivot order. D rows are NOT lower
        # triangular — full RREF lets a later pivot j2 > j eliminate
        # *above* into pivot row j — but only ops BEFORE row j's own pivot
        # time (j2 < j) belong in its frozen P value, so mask to the
        # strictly-lower triangle; row j2 is then final before any later
        # row consumes it. In-place on the out ref (a value-carried acc
        # doubles the live VMEM at (K, mw, bt) scale).
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (K, 1, bt), 0)

        def j_step(j2, _):
            dmask = (
                d_ref[:, j2 // _WORD, :]
                >> (j2 % _WORD).astype(jnp.uint32)
            ) & jnp.uint32(1)
            dmask = dmask[:, None, :] * (j_iota > j2).astype(jnp.uint32)
            pnew_ref[:] = pnew_ref[:] ^ (dmask * pnew_ref[j2][None, :, :])
            return 0

        jax.lax.fori_loop(0, K, j_step, 0)


class FactoredEliminator:
    """Batched wide-system GF(2) RREF solver, batch in lanes, T-free.

    ``__call__(order (B, n) int32, resid (m, B) uint32)`` returns
    ``(b (m, B) uint32, pivoted (m, B) uint32, piv_col (m, B) int32
    [original column ids, -1 where no pivot], overflow (B,) bool)``.
    The OSD-0 solution is ``corr[piv_col[r]] = b[r]`` over pivoted rows —
    bit-identical to decoders/osd.py::_eliminate_lanes_T's solution.
    ``overflow`` lanes ran out of column budget before resolving (raise
    ``max_cols``); the decoder auto-sizes the budget to rank(H) + 512,
    which clears the measured b-exit depth of in-image DEM syndromes
    (rank + ~150 at [[144]]/[[288]] scale).
    """

    def __init__(
        self,
        H: np.ndarray,
        *,
        h_rank: int,
        max_cols: int = 2048,
        batch_tile: int = 128,
        interpret: bool = False,
    ):
        H = (np.asarray(H) % 2).astype(np.uint8)
        self.m, self.n = H.shape
        self.h_rank = int(h_rank)
        self.interpret = interpret
        # row panel for kernel 2 AND the elimination kernel; 256 keeps the
        # packed b/piv row-words 8-sublane-aligned (epw = 256/32 = 8 — a
        # smaller panel would slice packed rows at sub-8 offsets, which
        # Mosaic's (8, 128) tiling rejects) while bounding per-column-step
        # live temporaries
        self.mp = 256
        self.m_pad = _round_up(self.m, self.mp)
        self.mw = self.m_pad // _WORD
        # VMEM fitting. The batch tile bt is the LANE (minor) dim of every
        # block, and Mosaic requires lane slices to stay 128-aligned
        # (bt = 64 fails to compile: "Slice shape along dimension 2 must be
        # aligned to tiling (128)") — so past-VMEM configurations shrink the
        # column-block width K instead: the elimination kernel's VMEM
        # residents are W (m_pad, kw, bt) + the cnew word (m_pad, bt) + the
        # row-PACKED b/piv (mw, bt), and Mosaic's kernel stack adds ~5 MB
        # of per-column-step temporaries on top (measured: 18.62 MB total
        # at [[288]] with then-unpacked b/piv vs a 13.4 MB resident model).
        # At [[288,12,18]] DEM scale K drops 128 -> 64; [[144,12,12]]
        # keeps K = 128 (measured-compiling).
        bt = max(128, batch_tile // 128 * 128)
        self.bt = bt

        def _elim_resident(k):
            return (
                self.m_pad * bt * 4 * (k // _WORD + 1)
                + 2 * self.mw * bt * 4
                + 2 * k * bt * 4
            )

        K = 128
        while K > 32 and _elim_resident(K) > 10.5e6:
            K //= 2
        if _elim_resident(K) > 10.5e6:
            raise ValueError(
                f"factored eliminator: m_pad={self.m_pad} cannot fit scoped "
                "VMEM even at K=32; use the XLA 'lanes' backend"
            )
        self.K, self.kw = K, K // _WORD
        # column budget. b-exit depth on in-image syndromes tracks rank(H)
        # (measured: [[144]] DEM ~1827 of rank ~1700s, [[288]] DEM ~5330 of
        # rank ~5180 — scripts round-4 probe), so the caller auto-raises
        # max_cols to rank + slack. s_max is rounded to a multiple of 1024
        # (when above it) so kernel 2's C panel width cwp divides cw evenly.
        ncols = min(max_cols, self.n)
        s_max = (
            _round_up(ncols, 1024) if ncols > 1024 else _round_up(ncols, K)
        )
        self.nb = _round_up(ncols, K) // K
        self.s_max = s_max
        self.cw = cw = s_max // _WORD
        self.cwp = 32 if (cw > 32 and cw % 32 == 0) else cw
        # kernel 2 (w_prog) residents: double-buffered (mp, cwp, bt) C
        # panels + the full (s_max, kw, bt) Y block + the (mp, kw, bt)
        # output panel. The measured-compiling configs sit at 15.2 MB
        # ([[288]] DEM) / 15.7 MB ([[144]] DEM), so 16 MB is the
        # demonstrated envelope; s_max grows with the caller's rank+slack
        # budget, so a larger DEM would otherwise die deep in Mosaic with
        # an opaque VMEM error (round-4 ADVICE item 2). Shrink the C-panel
        # width first, then the column-block K, and fail descriptively if
        # neither fits.
        def _w_resident():
            return (
                2 * self.mp * self.cwp * self.bt * 4
                + self.s_max * (self.K // _WORD) * self.bt * 4
                + 2 * self.mp * (self.K // _WORD) * self.bt * 4
            )

        while _w_resident() > 16.0e6 and self.cwp > 8 and self.cwp % 2 == 0 \
                and cw % (self.cwp // 2) == 0:
            self.cwp //= 2
        while _w_resident() > 16.0e6 and self.K > 32:
            self.K //= 2
        K = self.K
        self.kw = K // _WORD
        self.nb = _round_up(ncols, K) // K  # K divides 1024, s_max stays valid
        if _w_resident() > 16.0e6:
            raise ValueError(
                f"factored eliminator: kernel-2 residents "
                f"{_w_resident() / 1e6:.1f} MB (s_max={self.s_max}, "
                f"K={self.K}, cwp={self.cwp}) exceed the 16 MB VMEM "
                "envelope even at minimum tile sizes; use the XLA 'lanes' "
                "backend for this system"
            )
        # kernels 1 and 4 stream P in sp-row panels sized to their own
        # VMEM residents (kernel 4 additionally holds the (K, cw, bt)
        # gathered-C rows and the (K, mw, bt) accumulator). Kernel 4's
        # Mosaic stack overhead beyond the resident model is SHAPE-
        # DEPENDENT — measured: <= 2.04 MB at [[144]] (13.96 M modeled
        # compiled at the 16 M limit, round-4 375 ms config) but 3.49 MB
        # at [[288]] (14.65 M modeled -> 18.14 M actual, the scoped-VMEM
        # overflow that killed the round-5 study). Model it as
        # max(2 MB, 48*mw*bt*4) — linear in the packed row-word count,
        # 4.13 MB >= the 3.49 MB measured at [[288]]'s mw=168 — and
        # budget 16 MB minus that. This RESTORES the measured-fast
        # [[144]] config (K=128, sp4=64; a narrower P panel re-reads the
        # C-gather block per panel step and measured 2.4x slower overall)
        # while [[288]] drops K 64 -> 32 (fixed part 11.9 -> 5.9 MB) and
        # compiles. A K-shrink fallback covers shapes where even the
        # minimum 8-row panel cannot fit.
        def _k4_resident(k, rows):
            return (
                k * bt * 4 * (self.mw + cw + k // _WORD + 1)
                + 2 * rows * self.mw * bt * 4
            )

        budget4 = 16.0e6 - max(2.0e6, 48 * self.mw * bt * 4)
        while self.K > 32 and _k4_resident(self.K, 8) > budget4:
            self.K //= 2
        K = self.K
        self.kw = K // _WORD
        self.nb = _round_up(ncols, K) // K
        if _k4_resident(K, 8) > budget4:
            raise ValueError(
                f"factored eliminator: kernel-4 residents "
                f"{_k4_resident(K, 8) / 1e6:.1f} MB at K=32 exceed the "
                f"{budget4 / 1e6:.1f} MB budget (16 MB VMEM minus the "
                "shape-dependent Mosaic stack overhead); use the XLA "
                "'lanes' backend"
            )
        sp = 128
        while sp > 8 and (
            K * self.mw * bt * 4 + 2 * sp * self.mw * bt * 4 > 12.0e6
        ):
            sp //= 2
        self.sp = sp
        sp4 = 128
        while sp4 > 8 and _k4_resident(K, sp4) > budget4:
            sp4 //= 2
        self.sp4 = sp4
        # elimination row panel == mp (divides m_pad by construction;
        # epw = 8 keeps packed-row slices sublane-aligned)
        self.ep = self.mp

        Hp = np.pad(H, ((0, self.m_pad - self.m), (0, 0)))
        Ht = Hp.T.astype(np.uint32).reshape(self.n, self.mw, _WORD)
        shifts = np.arange(_WORD, dtype=np.uint32)
        hc = (Ht << shifts).sum(axis=-1).astype(np.uint32)  # (n, mw)
        self._Hc = jnp.asarray(np.pad(hc, ((0, 1), (0, 0))))  # row n = 0

    # -- pallas program builders --------------------------------------------
    @functools.lru_cache(maxsize=2)
    def _progs(self, B: int):
        bt, K, kw, mw, mp, sp = self.bt, self.K, self.kw, self.mw, self.mp, self.sp
        m_pad, s_max, cw = self.m_pad, self.s_max, self.cw
        ip = self.interpret
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)

        y_prog = pl.pallas_call(
            functools.partial(_y_kernel, sp=sp, mw=mw, kw=kw, bt=bt),
            grid=(B // bt, s_max // sp),
            in_specs=[
                smem,
                pl.BlockSpec((sp, mw, bt), lambda i, s: (s, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, mw, bt), lambda i, s: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((sp, kw, bt), lambda i, s: (s, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s_max, kw, B), jnp.uint32),
            interpret=ip,
        )

        cwp = self.cwp
        w_prog = pl.pallas_call(
            functools.partial(_w_kernel, mp=mp, kw=kw, bt=bt, cwp=cwp),
            grid=(B // bt, m_pad // mp, cw // cwp),
            in_specs=[
                smem,
                pl.BlockSpec((mp, cwp, bt), lambda i, j, c: (j, c, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s_max, kw, bt), lambda i, j, c: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mp // _WORD, K, bt), lambda i, j, c: (j, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((mp, kw, bt), lambda i, j, c: (j, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, kw, B), jnp.uint32),
            interpret=ip,
        )

        full = lambda *dims: pl.BlockSpec(
            dims, (lambda i: (0, i) if len(dims) == 2 else (0, 0, i)),
            memory_space=pltpu.VMEM,
        )
        elim_prog = pl.pallas_call(
            functools.partial(
                _elim_kernel, m_pad=m_pad, kw=kw, bt=bt, n=self.n,
                ep=self.ep,
            ),
            grid=(B // bt,),
            in_specs=[
                full(K, bt),
                pl.BlockSpec(memory_space=pltpu.ANY),  # W stays in HBM
                pl.BlockSpec(memory_space=pltpu.ANY),  # b — DMA'd in
                pl.BlockSpec(memory_space=pltpu.ANY),  # piv — DMA'd in
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.HBM),  # DMA'd at the end
                pl.BlockSpec(memory_space=pltpu.HBM),  # DMA'd at the end
                pl.BlockSpec(memory_space=pltpu.HBM),  # DMA'd per word
                full(K, bt),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((mw, B), jnp.uint32),
                jax.ShapeDtypeStruct((mw, B), jnp.uint32),
                jax.ShapeDtypeStruct((m_pad, kw, B), jnp.uint32),
                jax.ShapeDtypeStruct((K, B), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((m_pad, kw, bt), jnp.uint32),
                pltpu.VMEM((mw, bt), jnp.uint32),
                pltpu.VMEM((mw, bt), jnp.uint32),
                pltpu.VMEM((m_pad, bt), jnp.uint32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=ip,
        )

        sp4 = self.sp4
        res_prog = pl.pallas_call(
            functools.partial(
                _resolve_kernel, sp=sp4, mw=mw, kw=kw, bt=bt, K=K
            ),
            grid=(B // bt, s_max // sp4),
            in_specs=[
                smem,
                pl.BlockSpec((sp4, mw, bt), lambda i, s: (s, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, cw, bt), lambda i, s: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, kw, bt), lambda i, s: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, mw, bt), lambda i, s: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, mw, B), jnp.uint32),
            interpret=ip,
        )
        return y_prog, w_prog, elim_prog, res_prog

    def __call__(self, order: jax.Array, resid: jax.Array):
        B = order.shape[0]
        pad_b = (-B) % self.bt
        if pad_b:
            order = jnp.pad(order, ((0, pad_b), (0, 0)),
                            constant_values=self.n)
            resid = jnp.pad(resid, ((0, 0), (0, pad_b)))
        Bp = B + pad_b
        bt = self.bt
        m_pad, K = self.m_pad, self.K

        # column schedule, padded with the n sentinel (zero column)
        ncols = self.nb * K
        if order.shape[1] < ncols:
            order = jnp.pad(order, ((0, 0), (0, ncols - order.shape[1])),
                            constant_values=self.n)
        else:
            order = order[:, :ncols]

        # one lane SLAB (bt lanes) per map step: XLA keeps each pallas
        # call's whole output tuple in scoped VMEM (~16 MB), so per-call
        # output bytes must stay small — and each slab's block loop exits
        # on its own worst lane instead of the whole batch's
        nslab = Bp // bt
        order_s = order.reshape(nslab, bt, ncols)
        resid_s = resid.astype(jnp.uint32).reshape(
            self.m, nslab, bt
        ).transpose(1, 0, 2)

        b, piv, piv_col, overflow = jax.lax.map(self._slab, (order_s, resid_s))
        # (nslab, m, bt) -> (m, B)
        merge = lambda x: x.transpose(1, 0, 2).reshape(x.shape[1], Bp)
        sl = lambda x: x[..., :B] if pad_b else x
        return (
            sl(merge(b)),
            sl(merge(piv)),
            sl(merge(piv_col)),
            sl(overflow.reshape(Bp)),
        )

    def _slab(self, args):
        order, resid = args  # (bt, ncols) int32, (m, bt) uint32
        Bp = self.bt
        m_pad, K, kw, mw, cw = self.m_pad, self.K, self.kw, self.mw, self.cw
        y_prog, w_prog, elim_prog, res_prog = self._progs(Bp)

        # b/piv carry row-PACKED across blocks (bit r of word r//32): the
        # elimination kernel keeps them packed in VMEM scratch, and the
        # exit tests become word-wise ops
        shifts = jnp.arange(_WORD, dtype=jnp.uint32)[None, :, None]
        b0 = jnp.sum(
            jnp.pad(resid, ((0, m_pad - self.m), (0, 0)))
            .reshape(mw, _WORD, Bp)
            .astype(jnp.uint32)
            << shifts,
            axis=1,
            dtype=jnp.uint32,
        )
        state = dict(
            P=jnp.zeros((self.s_max, mw, Bp), jnp.uint32),
            C=jnp.zeros((m_pad, cw, Bp), jnp.uint32),
            b=b0,
            piv=jnp.zeros((mw, Bp), jnp.uint32),
            piv_col=jnp.full((m_pad + 1, Bp), -1, jnp.int32),
            blk=jnp.int32(0),
        )

        lane = jnp.arange(Bp)[None, :]

        def lane_done(st):
            unres = jnp.any((st["b"] & ~st["piv"]) != 0, axis=0)
            rank = jnp.sum(
                jax.lax.population_count(st["piv"]), axis=0, dtype=jnp.int32
            )
            return ~unres | (rank >= self.h_rank)

        def cond(st):
            return (st["blk"] < self.nb) & ~jnp.all(lane_done(st))

        def body(st):
            blk = st["blk"]
            scur = (blk * K).astype(jnp.int32).reshape(1)
            ids = jax.lax.dynamic_slice(
                order, (jnp.int32(0), blk * K), (Bp, K)
            )  # (Bp, K)
            g = self._Hc[ids]  # (Bp, K, mw) XLA row gather
            hblk = g.transpose(1, 2, 0)  # (K, mw, Bp) for kernel 1
            hblk_t = g.transpose(2, 1, 0)  # (mw, K, Bp) for kernel 2
            idsT = ids.T  # (K, Bp)

            Y = y_prog(scur, st["P"], hblk)
            W = w_prog(scur, st["C"], Y, hblk_t)
            b, piv, cnew, prow = elim_prog(idsT, W, st["b"], st["piv"])

            valid = prow < m_pad  # (K, Bp)
            pcl = jnp.minimum(prow, m_pad - 1)[:, None, :]
            G = jnp.take_along_axis(st["C"], pcl, axis=0)  # (K, cw, Bp)
            D = jnp.take_along_axis(cnew, pcl, axis=0)  # (K, kw, Bp)
            G = jnp.where(valid[:, None, :], G, jnp.uint32(0))
            D = jnp.where(valid[:, None, :], D, jnp.uint32(0))
            Pnew = res_prog(scur, st["P"], G, D, prow)

            z = jnp.int32(0)
            P = jax.lax.dynamic_update_slice(st["P"], Pnew, (blk * K, z, z))
            C = jax.lax.dynamic_update_slice(
                st["C"], cnew, (z, blk * kw, z)
            )
            piv_col = st["piv_col"].at[
                jnp.minimum(prow, m_pad), lane
            ].set(jnp.where(valid, idsT, -1))
            return dict(P=P, C=C, b=b, piv=piv, piv_col=piv_col,
                        blk=blk + 1)

        state = jax.lax.while_loop(cond, body, state)
        overflow = ~lane_done(state)
        # unpack the packed b/piv back to {0,1}-per-row planes (the
        # __call__ contract consumed by decoders/osd.py)
        rows = jnp.arange(self.m)
        sh = (rows & 31)[:, None].astype(jnp.uint32)
        b_u = (state["b"][rows >> 5, :] >> sh) & jnp.uint32(1)
        piv_u = (state["piv"][rows >> 5, :] >> sh) & jnp.uint32(1)
        return (
            b_u,
            piv_u,
            state["piv_col"][: self.m],
            overflow,
        )
