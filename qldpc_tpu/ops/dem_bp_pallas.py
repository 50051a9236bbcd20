"""Streamed Pallas BP kernel for DEM-scale irregular Tanner graphs.

The fused VMEM-resident kernel (ops/bp_pallas.py) needs one-hot (E', n)
tables — ruled out for circuit-level detector error models (432 x 15765,
~104k edges: tables would be GBs). This kernel handles those graphs with a
TPU-native streaming design built from measured primitives (TPU v5e,
scripts/profile_dem_{bp,micro}.py):

  * everything lives in a TRANSPOSED, batch-minor layout: values (n', B),
    messages (S, B), syndromes (m, B). XLA's axis-0 row gather in this
    layout moves contiguous (1, B) rows and runs at ~1.3 ms per (S, B)
    slot-space at B=1024 — FASTER than one elementwise pass (2.1 ms),
    because each random read is a full 4 KB row;
  * check-side message space is padded to dc_pad = ceil(dc_max/8)*8 slots
    per check, so one check = an aligned (dc_pad, B) sublane block and the
    whole check update is a single streamed Pallas pass over (S, B):
    Q = gathered_values - R_prev, two-minima / log-domain product along the
    dc axis, R_new written back — one read+read+write of the slot space
    instead of the XLA path's ~18 materialized passes;
  * the variable update streams the var-major gathered messages through a
    second tiny kernel (sum over <=12 slots + prior + convergence freeze);
  * the syndrome check is free: the check pass already sees the gathered
    posterior of every (check, var) slot, so the hard-decision parity of
    iteration i's values falls out of iteration i+1's streamed pass
    (detection is pipelined one step behind; one extra detection pass after
    the loop covers the final iteration). Freeze semantics and outputs
    match decoders/bp.py exactly (tests/test_dem_pallas.py).

Per-iteration HBM traffic: one slot-space gather + 3 slot-space streams +
one var-space gather+stream ~= 8 ms at B=1024 on v5e vs ~38 ms for the XLA
slot path (~4.6x); early exit and lower max_iter compound on top for the
engine workload. Reference workload: studies/studyComplete.py:99-104.

``stream_dtype="bfloat16"`` halves every slot-space stream (the values
gather, the R carry, the r_new write-back and the var-side gather) while
keeping ALL arithmetic in float32 inside the kernels (bf16 -> f32 upcast
is exact; only the stream write-backs round). The posterior-LLR carry and
the convergence/detection logic stay float32, so converged lanes still
satisfy their syndrome exactly — but decisions no longer bit-match the
f32 XLA slot path (near-tie message roundings can flip), which is why it
is opt-in (BPConfig.stream_dtype) and off by default.

In-kernel arbitrary gathers are NOT used: Mosaic's dynamic_gather only
supports within-tile shuffles (take_along_axis crashes the TPU compiler
beyond one (8, 128) tile — probed 2026-08-19), so the gathers stay in XLA
where they are measured-fast, and the kernels consume pre-gathered streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qldpc_tpu.ops.tanner import TannerGraph

__all__ = ["DEMPallasBPKernel"]

_TANH_CLIP = 0.9999999
_BIG = 1.0e9  # pinned posterior of phantom/padding rows (sign +, |.| huge)


def _round_up(x: int, k: int) -> int:
    return -(-x // k) * k


def _arctanh(x):
    return 0.5 * jnp.log((1.0 + x) / (1.0 - x))


# --------------------------------------------------------------------------
# check-update kernel: one streamed pass over the (S_pad, B) slot space
# --------------------------------------------------------------------------
def _check_kernel(
    vg_ref,  # (CK*dcp, bt) gathered posteriors at this chunk's slots
    r_ref,  # (CK*dcp, bt) R_prev
    ssign_ref,  # (CK, bt) 1-2s syndrome signs
    mask_ref,  # (CK*dcp, 1) 1.0 real slot / 0.0 phantom
    rnew_ref,  # out (CK*dcp, bt)
    shat_ref,  # out (CK, bt) hard-decision syndrome parity of the
    #            posteriors BEHIND vg (i.e. the previous iteration's values)
    *,
    ck: int,
    dcp: int,
    bt: int,
    method: str,
    alpha: float,
    offset: float,
    clip_llr: float | None,
):
    vg = vg_ref[:].astype(jnp.float32)  # bf16 -> f32 upcast is exact
    q = vg - r_ref[:].astype(jnp.float32)
    mask = mask_ref[:]
    if clip_llr is not None:
        # clipping must not tame the phantom BIG (it has to stay the
        # neutral element of min/tanh), hence the masked re-pin
        q = jnp.where(mask > 0, jnp.clip(q, -clip_llr, clip_llr), _BIG)
    q3 = q.reshape(ck, dcp, bt)
    ssign3 = ssign_ref[:].reshape(ck, 1, bt)

    # hard-decision parity of the gathered posteriors (phantom rows are
    # +BIG so they contribute 0); this is H @ hard(values_prev) mod 2
    hb = (vg < 0).astype(jnp.float32).reshape(ck, dcp, bt)
    cnt = jnp.sum(hb, axis=1)
    shat_ref[:] = cnt - 2.0 * jnp.floor(cnt * 0.5)

    neg = jnp.sum((q3 < 0).astype(jnp.float32), axis=1, keepdims=True)
    total_sign = 1.0 - 2.0 * (neg - 2.0 * jnp.floor(neg * 0.5))

    if method == "min-sum":
        sgn = jnp.where(q3 >= 0, 1.0, -1.0)
        aq = jnp.abs(q3)
        min1 = jnp.min(aq, axis=1, keepdims=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, (ck, dcp, bt), 1)
        # first-occurrence argmin via a min over masked indices — exactly
        # jnp.argmin's tie rule, no unsupported arg-reductions needed
        amin = jnp.min(
            jnp.where(aq == min1, idx, dcp), axis=1, keepdims=True
        )
        min2 = jnp.min(jnp.where(idx == amin, _BIG, aq), axis=1, keepdims=True)
        mags = jnp.where(idx == amin, min2, min1)
        if offset:
            mags = jnp.maximum(mags - offset, 0.0)
        r3 = ssign3 * total_sign * sgn * mags
    else:  # sum-product, log-domain one-pass (the XLA path's dc>16 form)
        t = jnp.tanh(q3 * 0.5)  # phantom: tanh(BIG/2) == 1 exactly
        s = jnp.where(t >= 0, 1.0, -1.0)
        lt = jnp.log(jnp.maximum(jnp.abs(t), 1e-15))
        total = jnp.sum(lt, axis=1, keepdims=True)
        others = jnp.exp(total - lt) * total_sign * s
        clipped = jnp.clip(others * ssign3, -_TANH_CLIP, _TANH_CLIP)
        r3 = 2.0 * _arctanh(clipped)

    if alpha != 1.0:
        r3 = r3 * alpha
    rnew_ref[:] = r3.reshape(ck * dcp, bt).astype(rnew_ref.dtype)


class DEMPallasBPKernel:
    """Streamed-BP callable for one irregular parity-check matrix.

    ``__call__(syndromes (B, m) int, priors (n,) | (B, n) f32)`` returns
    ``(values (B, n) f32, converged (B,) bool, iterations (B,) int32)`` —
    the same contract as :class:`~qldpc_tpu.ops.bp_pallas.PallasBPKernel`,
    with semantics equal to the XLA slot path of
    :class:`~qldpc_tpu.decoders.bp.BPDecoder`.
    """

    def __init__(
        self,
        graph: TannerGraph,
        *,
        max_iter: int,
        method: str = "sum-product",
        alpha: float = 1.0,
        offset: float = 0.0,
        clip_llr: float | None = None,
        chunk_size: int = 0,
        check_chunk: int = 4,
        stream_dtype: str = "float32",
        interpret: bool = False,
    ):
        if chunk_size and max_iter % chunk_size:
            raise ValueError("max_iter must be a multiple of chunk_size")
        if stream_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unsupported stream_dtype {stream_dtype!r}")
        self._sd = jnp.dtype(stream_dtype)
        g = graph
        self.graph = g
        self.max_iter = max_iter
        self.method = method
        self.chunk_size = chunk_size
        self.interpret = interpret
        m, n, E = g.m, g.n, g.num_edges

        self._dcp = dcp = _round_up(g.dc_max, 8)
        # Mosaic block rows must be multiples of 8: pad the check count and
        # pick a chunk that divides it (phantom checks are all-phantom
        # slots: s_hat 0 == padded syndrome 0, so they never block a match)
        m_pad = _round_up(m, 8)
        check_chunk = max(8, _round_up(check_chunk, 8))
        while m_pad % check_chunk:
            check_chunk -= 8
        self._ck = ck = check_chunk
        self._nchunks = m_pad // ck
        # Measured TPU compile-crash envelope (results/bench_circuit144_r4.json,
        # all four ck16 cells): a (ck*dcp, bt) gathered chunk panel of >= 5120
        # rows at >= [[144,12,12]]-scale slot space reliably kills the Mosaic
        # compiler (remote-compile helper HTTP 500 after ~2 min). Fail fast
        # with the known bound instead.
        if not interpret and ck * dcp >= 5120 and m_pad * dcp >= 500_000:
            raise ValueError(
                f"check_chunk={ck} with dc_pad={dcp} gives a {ck * dcp}-row "
                f"chunk panel over a {m_pad * dcp}-slot space — beyond the "
                "measured TPU compile envelope (ck=16 crashes the Mosaic "
                "compiler at [[144,12,12]] DEM scale; "
                "results/bench_circuit144_r4.json). Use check_chunk<=8 "
                "(ck*dc_pad<=2560 is the measured-good region)."
            )
        self._n_pad = n_pad = _round_up(n + 1, 8)  # >= 1 BIG-pinned pad row
        self._m, self._n = m, n
        self._m_pad = m_pad
        S_pad = m_pad * dcp
        self._S_pad = S_pad

        # slot tables in the padded check-major layout: row c*dcp + j —
        # vectorized (DEM graphs have 10^5-10^6 edges)
        checks = g.check_of_edge.astype(np.int64)
        dc = np.bincount(checks, minlength=m)
        starts = np.concatenate([[0], np.cumsum(dc)[:-1]])
        slot_in_check = np.arange(E) - np.repeat(starts, dc)
        slot_of_edge = checks * dcp + slot_in_check
        vos = np.full(S_pad, n, np.int64)  # phantom -> BIG values row n
        vos[slot_of_edge] = g.var_of_edge
        mask = (vos != n).astype(np.float32)[:, None]

        # --- variable side: exact per-degree buckets --------------------------
        # A single padded (n, dv_max) gather moves 1.8x the real edge count
        # (and measured ~6x slower than the slot gather on v5e); instead,
        # vars are RELABELED sorted by degree and each degree class d gets
        # an exact (n_d * d,) gather + a d-term sequential fold. The
        # relabeling is internal: vos speaks new labels, outputs are
        # unpermuted once per decode.
        dv = np.bincount(g.var_of_edge, minlength=n)
        order = np.argsort(dv, kind="stable")  # new index -> old var
        inv_order = np.empty(n, np.int64)
        inv_order[order] = np.arange(n)

        # per-var slot lists, var-major and j-ordered (edge order within a
        # var matches TannerGraph's check-major edge order) — vectorized:
        # sort edges by var (stable), then group ranges
        by_var = np.argsort(g.var_of_edge, kind="stable")
        slots_by_var = slot_of_edge[by_var]  # concatenated per-var runs
        v_starts = np.concatenate([[0], np.cumsum(dv)[:-1]])

        self._buckets = []  # (degree, count, ve_flat (count*d,) int32)
        start = 0
        for d in np.unique(dv):
            sel = order[dv[order] == d]  # vars of degree d, new-label order
            cnt = sel.size
            if d == 0:
                # detector-less mechanisms (observable-only faults) have
                # empty H columns: their posterior is the bare prior
                self._buckets.append((0, cnt, None))
            else:
                idx = (
                    v_starts[sel][:, None] + np.arange(d)[None, :]
                ).reshape(-1)
                vef = slots_by_var[idx]
                self._buckets.append(
                    (int(d), cnt, jnp.asarray(vef, jnp.int32))
                )
            start += cnt
        assert start == n

        vos_new = np.where(vos == n, n, inv_order[np.minimum(vos, n - 1)])
        self._vos = jnp.asarray(vos_new, jnp.int32)
        self._order = jnp.asarray(order, jnp.int32)
        self._inv_order = jnp.asarray(inv_order, jnp.int32)
        self._mask = jnp.asarray(mask)
        self._alpha, self._offset, self._clip = alpha, offset, clip_llr

    # -- pallas program builders (cached per lane count) --------------------
    @functools.lru_cache(maxsize=4)
    def _check_prog(self, bt: int):
        ck, dcp, m = self._ck, self._dcp, self._m_pad
        S_pad = self._S_pad
        kernel = functools.partial(
            _check_kernel,
            ck=ck,
            dcp=dcp,
            bt=128,
            method=self.method,
            alpha=self._alpha,
            offset=self._offset,
            clip_llr=self._clip,
        )
        rows = ck * dcp
        blk = lambda r: pl.BlockSpec(
            (r, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(self._nchunks, bt // 128),
            in_specs=[
                blk(rows),
                blk(rows),
                blk(ck),
                pl.BlockSpec((rows, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(blk(rows), blk(ck)),
            out_shape=(
                jax.ShapeDtypeStruct((S_pad, bt), self._sd),
                jax.ShapeDtypeStruct((m, bt), jnp.float32),
            ),
            interpret=self.interpret,
        )

    def _var_sum(self, r_new, bt):
        """values-side message sums in the relabeled var order: one exact
        gather + sequential left-fold per degree class (the fold order per
        var matches decoders/bp.py::_step bitwise)."""
        parts = []
        for d, cnt, vef in self._buckets:
            if d == 0:
                parts.append(jnp.zeros((cnt, bt), jnp.float32))
                continue
            rv = r_new[vef, :].reshape(cnt, d, bt)
            acc = rv[:, 0, :].astype(jnp.float32)
            for j in range(1, d):
                acc = acc + rv[:, j, :].astype(jnp.float32)
            parts.append(acc)
        return jnp.concatenate(parts, axis=0)  # (n, bt)

    # -- one BP step ---------------------------------------------------------
    def _step(self, carry, syn_T, priors_T, bt):
        values, R, conv, iters, step = carry
        vs = values if self._sd == jnp.float32 else values.astype(self._sd)
        vg = vs[self._vos, :]  # (S_pad, bt) XLA row gather
        r_new, s_hat = self._check_prog(bt)(vg, R, 1.0 - 2.0 * syn_T,
                                            self._mask)
        # s_hat belongs to the PREVIOUS iteration's values: detection is
        # pipelined one step behind (step 0's s_hat reflects the prior
        # initialization and is discarded)
        match = jnp.all(s_hat == syn_T, axis=0) & (step > 0)
        newly = match & ~conv
        conv = conv | match
        iters = jnp.where(newly, step - 1, iters)
        vals = self._var_sum(r_new, bt) + priors_T[: self._n, :]
        vals = jnp.concatenate(
            [vals, priors_T[self._n:, :]], axis=0
        )  # BIG pad rows stay pinned
        values_new = jnp.where(conv[None, :], values, vals)
        return values_new, r_new, conv, iters, step + 1

    def _detect_final(self, carry, syn_T):
        """Post-loop detection of the last iteration's values (the pipeline
        leaves them unchecked)."""
        values, _R, conv, iters, step = carry
        vg = values[self._vos, :]
        hb = (vg < 0).astype(jnp.float32).reshape(self._m_pad, self._dcp, -1)
        cnt = jnp.sum(hb, axis=1)
        s_hat = cnt - 2.0 * jnp.floor(cnt * 0.5)
        match = jnp.all(s_hat == syn_T, axis=0) & (step > 0)
        newly = match & ~conv
        conv = conv | match
        iters = jnp.where(newly, step - 1, iters)
        return values, conv, iters

    def __call__(self, syndromes: jax.Array, priors: jax.Array):
        B = syndromes.shape[0]
        bt = _round_up(max(B, 1), 128)
        n, n_pad = self._n, self._n_pad

        syn_T = jnp.pad(
            syndromes.astype(jnp.float32),
            ((0, bt - B), (0, self._m_pad - self._m)),
        ).T  # (m_pad, bt)
        priors_b = jnp.broadcast_to(jnp.asarray(priors, jnp.float32), (B, n))
        priors_b = priors_b[:, self._order]  # relabeled var order
        priors_T = jnp.full((n_pad, bt), _BIG, jnp.float32)
        priors_T = jax.lax.dynamic_update_slice(
            priors_T, jnp.pad(priors_b, ((0, bt - B), (0, 0)),
                              constant_values=1.0).T, (0, 0)
        )

        carry = (
            priors_T,
            jnp.zeros((self._S_pad, bt), self._sd),
            jnp.zeros((bt,), bool),
            jnp.full((bt,), max(self.max_iter - 1, 0), jnp.int32),
            jnp.zeros((), jnp.int32),
        )

        def one(c, _):
            return self._step(c, syn_T, priors_T, bt), None

        if self.chunk_size:
            def cond(c):
                return (c[4] < self.max_iter) & ~jnp.all(c[2])

            def body(c):
                c, _ = jax.lax.scan(one, c, None, length=self.chunk_size)
                return c

            carry = jax.lax.while_loop(cond, body, carry)
        else:
            carry, _ = jax.lax.scan(one, carry, None, length=self.max_iter)

        values_T, conv, iters = self._detect_final(carry, syn_T)
        iters = jnp.where(conv, iters, max(self.max_iter - 1, 0))
        values = values_T[self._inv_order, :B].T  # back to caller var order
        return values, conv[:B], iters[:B]
