"""Fused Pallas TPU kernel for structured space-time BP.

The generic fused kernel (ops/bp_pallas.py) keeps O(n * E') one-hot tables
in VMEM, which evicts it for space-time graphs ([[144,12,12]] at T=12 needs
~72 MiB of tables) — exactly the "scale the rounds" workload. This kernel
exploits the block structure of ``H_st = [I_T (x) H | I + S_{-m}]``
(noise/spacetime.py) the same way decoders/spacetime_bp.py does on the XLA
path, so VMEM table memory is the BASE code's only, independent of T:

  * data-edge messages live as (dc, T*m, BT) slot planes — row = t*m + c,
    batch in lanes; every round reuses the base code's one-hot tables via
    per-round MXU matmuls on contiguous row blocks (a static T-loop, no
    transposes);
  * the two temporal edges of each check are two extra (T*m, BT) planes;
    the temporal variable update is a static m-row shift (u_t couples
    checks t and t+1), not a gather;
  * the check update is a leave-one-out product over dc+2 static slots
    (prefix/suffix products, division-free per CLAUDE.md);
  * per-lane convergence freeze + whole-tile early exit match
    ops/bp_pallas.py.

Decision parity with SpaceTimeBPDecoder / BPDecoder-on-materialized-H_st is
asserted in tests/test_spacetime_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qldpc_tpu.ops.bp_pallas import _TANH_CLIP, _arctanh, _BIG, _build_tables
from qldpc_tpu.ops.tanner import TannerGraph

__all__ = ["PallasSpaceTimeBPKernel"]


def _st_bp_kernel(
    # inputs
    syn_ref,  # (T*m, BT) f32 0/1 detector syndrome
    prior_sp_ref,  # (T*n, 1) f32 data-variable priors
    prior_u_ref,  # (T*m, 1) f32 measurement-variable priors
    mve_ref,  # (n, Ep) base var-sum one-hot
    mev_ref,  # (Ep, n) base edge-broadcast one-hot
    h_ref,  # (m, n) base parity check
    mask_ref,  # (Ep, 1) real-edge mask (base graph)
    # outputs
    vsp_ref,  # (T*n, BT) posterior LLRs, data variables
    vu_ref,  # (T*m, BT) posterior LLRs, measurement variables
    conv_ref,  # (1, BT)
    iters_ref,  # (1, BT)
    # scratch
    qd_ref,  # (dc, T*m, BT) data-edge messages
    qa_ref,  # (T*m, BT) u_t -> check t messages
    qb_ref,  # (T*m, BT) u_{t-1} -> check t messages (rows < m pinned BIG)
    done_ref,  # (1,) SMEM
    *,
    m: int,
    n: int,
    dc: int,
    T: int,
    bt: int,
    max_iter: int,
    method: str,
    alpha: float,
    offset: float,
    damping: float,
    clip_llr: float | None,
):
    Ep = dc * m
    Tm = T * m
    ssign = 1.0 - 2.0 * syn_ref[:]  # (T*m, BT)

    # ---- init ---------------------------------------------------------------
    # data edges: Q = prior of the edge's variable, per round (phantom -> BIG)
    for t in range(T):
        pr_t = prior_sp_ref[t * n : (t + 1) * n]  # (n, 1)
        pe = jnp.dot(mev_ref[:], pr_t, preferred_element_type=jnp.float32)
        pe = jnp.where(mask_ref[:] > 0, pe, _BIG)  # (Ep, 1)
        qd_ref[:, t * m : (t + 1) * m, :] = jnp.broadcast_to(
            pe.reshape(dc, m, 1), (dc, m, bt)
        )
    pu = jnp.broadcast_to(prior_u_ref[:], (Tm, bt))
    qa_ref[:] = pu
    # u_{t-1} edge of check t carries u's prior; rows of round 0 are phantom
    qb_shift = jnp.concatenate(
        [jnp.full((m, bt), _BIG, jnp.float32), pu[: Tm - m]], axis=0
    )
    qb_ref[:] = qb_shift
    vsp_ref[:] = jnp.broadcast_to(prior_sp_ref[:], (T * n, bt))
    vu_ref[:] = pu
    conv_ref[:] = jnp.zeros((1, bt), jnp.float32)
    iters_ref[:] = jnp.full((1, bt), float(max(max_iter - 1, 0)), jnp.float32)
    done_ref[0] = 0

    mask_b = jnp.concatenate(  # u_{t-1} slot is phantom in round 0
        [jnp.zeros((m, 1), jnp.float32), jnp.ones((Tm - m, 1), jnp.float32)],
        axis=0,
    )

    def leave_one_out(slots):
        """others[i] = product over j != i of slots[j] (static lists)."""
        k = len(slots)
        pre = [None] * k
        suf = [None] * k
        acc = None
        for i in range(k):
            pre[i] = acc
            acc = slots[i] if acc is None else acc * slots[i]
        acc = None
        for i in reversed(range(k)):
            suf[i] = acc
            acc = slots[i] if acc is None else acc * slots[i]
        out = []
        for i in range(k):
            if pre[i] is None:
                out.append(suf[i])
            elif suf[i] is None:
                out.append(pre[i])
            else:
                out.append(pre[i] * suf[i])
        return out

    def iteration(it, _):
        @pl.when(done_ref[0] == 0)
        def _():
            # ---- check update over dc data slots + 2 temporal slots --------
            q_slots = [qd_ref[i] for i in range(dc)] + [qa_ref[:], qb_ref[:]]
            if method == "sum-product":
                tt = [jnp.tanh(q * 0.5) for q in q_slots]
                others = leave_one_out(tt)
                r_slots = [
                    2.0 * _arctanh(jnp.clip(o * ssign, -_TANH_CLIP, _TANH_CLIP))
                    for o in others
                ]
            else:  # min-sum: sign product + two smallest magnitudes
                one = jnp.float32(1.0)
                sg = [jnp.where(q >= 0, one, -one) for q in q_slots]
                aq = [jnp.abs(q) for q in q_slots]
                min1 = aq[0]
                amin = jnp.zeros_like(aq[0])
                for i in range(1, dc + 2):
                    better = aq[i] < min1
                    min1 = jnp.where(better, aq[i], min1)
                    amin = jnp.where(better, float(i), amin)
                min2 = None
                for i in range(dc + 2):
                    masked = jnp.where(amin == float(i), jnp.inf, aq[i])
                    min2 = masked if min2 is None else jnp.minimum(min2, masked)
                osign = leave_one_out(sg)

                def _mag(i):
                    mags = jnp.where(amin == float(i), min2, min1)
                    if offset:
                        mags = jnp.maximum(mags - offset, 0.0)
                    return mags

                r_slots = [
                    ssign * osign[i] * _mag(i) for i in range(dc + 2)
                ]
            if alpha != 1.0:
                r_slots = [r * alpha for r in r_slots]
            r_a = r_slots[dc]
            r_b = r_slots[dc + 1] * mask_b  # round-0 temporal slot is phantom

            # ---- data-variable update: per-round base-table matmuls --------
            for t in range(T):
                rows = slice(t * m, (t + 1) * m)
                r_flat_t = jnp.concatenate(
                    [r_slots[i][rows].reshape(1, m, bt) for i in range(dc)],
                    axis=0,
                ).reshape(Ep, bt)
                r_flat_t = r_flat_t * mask_ref[:]
                r_sum = jnp.dot(
                    mve_ref[:], r_flat_t, preferred_element_type=jnp.float32
                )
                values_t = r_sum + prior_sp_ref[t * n : (t + 1) * n]  # (n, BT)
                vrows = slice(t * n, (t + 1) * n)
                v_edges = jnp.dot(
                    mev_ref[:], values_t, preferred_element_type=jnp.float32
                )
                q_new_t = (v_edges - r_flat_t).reshape(dc, m, bt)
                if damping != 1.0:
                    q_new_t = (
                        damping * q_new_t
                        + (1.0 - damping) * qd_ref[:, rows, :]
                    )
                if clip_llr is not None:
                    q_new_t = jnp.clip(q_new_t, -clip_llr, clip_llr)
                q_new_t = jnp.where(
                    mask_ref[:].reshape(dc, m, 1) > 0, q_new_t, _BIG
                )
                qd_ref[:, rows, :] = q_new_t
                # freeze handled on the posterior below; stash values now
                conv_prev = conv_ref[:]
                vsp_ref[vrows] = jnp.where(
                    conv_prev < 0.5, values_t, vsp_ref[vrows]
                )

            # ---- temporal-variable update: static m-row shifts -------------
            # u_t couples check (t, c) via r_a[t] and check (t+1, c) via
            # r_b[t+1]; shifting r_b up by one round aligns both on u's rows
            r_b_next = jnp.concatenate(
                [r_b[m:], jnp.zeros((m, bt), jnp.float32)], axis=0
            )
            values_u = r_a + r_b_next + jnp.broadcast_to(prior_u_ref[:], (Tm, bt))
            qa_new = values_u - r_a
            qb_new = jnp.concatenate(
                [
                    jnp.full((m, bt), _BIG, jnp.float32),
                    values_u[: Tm - m] - r_b[m:],
                ],
                axis=0,
            )
            if damping != 1.0:
                qa_new = damping * qa_new + (1.0 - damping) * qa_ref[:]
                qb_tail = (
                    damping * qb_new[m:] + (1.0 - damping) * qb_ref[:][m:]
                )
                qb_new = jnp.concatenate([qb_new[:m], qb_tail], axis=0)
            if clip_llr is not None:
                qa_new = jnp.clip(qa_new, -clip_llr, clip_llr)
                qb_new = jnp.concatenate(
                    [qb_new[:m], jnp.clip(qb_new[m:], -clip_llr, clip_llr)],
                    axis=0,
                )
            qa_ref[:] = qa_new
            qb_ref[:] = qb_new

            # ---- hard decision + structured syndrome check ------------------
            # s_hat(t) = H @ hard_sp(t) + hard_u(t) + hard_u(t-1)
            hard_u = (values_u < 0).astype(jnp.float32)
            hu_prev = jnp.concatenate(
                [jnp.zeros((m, bt), jnp.float32), hard_u[: Tm - m]], axis=0
            )
            conv_prev = conv_ref[:]
            not_frozen = conv_prev < 0.5
            eq_min = None
            for t in range(T):
                # vsp was just overwritten with the live values for active
                # lanes; frozen lanes hold their convergence-time posterior,
                # whose parity already matches (conv stays 1 via max below)
                hard_t = (vsp_ref[t * n : (t + 1) * n] < 0).astype(jnp.float32)
                counts = (
                    jnp.dot(h_ref[:], hard_t, preferred_element_type=jnp.float32)
                    + hard_u[t * m : (t + 1) * m]
                    + hu_prev[t * m : (t + 1) * m]
                )
                parity = counts - 2.0 * jnp.floor(counts * 0.5)
                eq = (parity == syn_ref[t * m : (t + 1) * m]).astype(jnp.float32)
                e = jnp.min(eq, axis=0, keepdims=True)
                eq_min = e if eq_min is None else jnp.minimum(eq_min, e)
            ok = eq_min  # (1, BT)

            vu_ref[:] = jnp.where(not_frozen, values_u, vu_ref[:])
            iters_ref[:] = jnp.where(
                not_frozen, it.astype(jnp.float32), iters_ref[:]
            )
            conv_now = jnp.maximum(conv_prev, ok)
            conv_ref[:] = conv_now
            done_ref[0] = jnp.min(conv_now).astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, max_iter, iteration, 0)


class PallasSpaceTimeBPKernel:
    """Compiled fused structured space-time BP for a fixed base graph + T.

    ``__call__(detectors (B, T*m) int, priors (T*n + T*m,) f32)`` returns
    ``(values (B, T*n + T*m) f32, converged (B,) bool, iterations (B,) int32)``
    — the column order of noise/spacetime.py::space_time_matrix.
    """

    def __init__(
        self,
        graph: TannerGraph,
        n_rounds: int,
        *,
        max_iter: int,
        method: str = "sum-product",
        alpha: float = 1.0,
        offset: float = 0.0,
        damping: float = 1.0,
        clip_llr: float | None = None,
        batch_tile: int = 128,
        interpret: bool = False,
    ):
        self.graph = graph
        self.T = n_rounds
        self.batch_tile = batch_tile
        t = _build_tables(graph)
        self._tables = t
        m, n, dc = graph.m, graph.n, graph.dc_max
        self._m, self._n, self._dc = m, n, dc
        self._interpret = interpret
        self._kernel = functools.partial(
            _st_bp_kernel,
            m=m,
            n=n,
            dc=dc,
            T=n_rounds,
            bt=batch_tile,
            max_iter=max_iter,
            method=method,
            alpha=alpha,
            offset=offset,
            damping=damping,
            clip_llr=clip_llr,
        )

    @functools.lru_cache(maxsize=8)
    def _built(self, n_tiles: int):
        m, n, dc, T = self._m, self._n, self._dc, self.T
        Ep = dc * m
        bt = self.batch_tile

        tile = lambda rows: pl.BlockSpec(
            (rows, bt), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        full = lambda r, c: pl.BlockSpec(
            (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            self._kernel,
            grid=(n_tiles,),
            in_specs=[
                tile(T * m),  # detectors
                full(T * n, 1),  # data priors
                full(T * m, 1),  # measurement priors
                full(n, Ep),
                full(Ep, n),
                full(m, n),
                full(Ep, 1),
            ],
            out_specs=(tile(T * n), tile(T * m), tile(1), tile(1)),
            out_shape=(
                jax.ShapeDtypeStruct((T * n, n_tiles * bt), jnp.float32),
                jax.ShapeDtypeStruct((T * m, n_tiles * bt), jnp.float32),
                jax.ShapeDtypeStruct((1, n_tiles * bt), jnp.float32),
                jax.ShapeDtypeStruct((1, n_tiles * bt), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((dc, T * m, bt), jnp.float32),
                pltpu.VMEM((T * m, bt), jnp.float32),
                pltpu.VMEM((T * m, bt), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
            ],
            interpret=self._interpret,
        )

    def __call__(self, detectors: jax.Array, priors: jax.Array):
        B = detectors.shape[0]
        bt = self.batch_tile
        pad = (-B) % bt
        n_tiles = (B + pad) // bt
        t = self._tables
        T, n, m = self.T, self._n, self._m

        syn_t = jnp.pad(detectors.astype(jnp.float32), ((0, pad), (0, 0))).T
        priors = jnp.asarray(priors, jnp.float32)
        prior_sp = priors[: T * n].reshape(T * n, 1)
        prior_u = priors[T * n :].reshape(T * m, 1)

        vsp_t, vu_t, conv_t, iters_t = self._built(n_tiles)(
            syn_t,
            prior_sp,
            prior_u,
            jnp.asarray(t.M_ve),
            jnp.asarray(t.M_ev),
            jnp.asarray(t.H),
            jnp.asarray(t.mask),
        )
        values = jnp.concatenate([vsp_t.T[:B], vu_t.T[:B]], axis=1)
        conv = conv_t[0, :B] > 0.5
        iters = iters_t[0, :B].astype(jnp.int32)
        return values, conv, iters
