"""Fused Pallas TPU kernel for batched BP decoding.

The XLA path (decoders/bp.py) round-trips the (B, E) message arrays through
HBM on every scan iteration. This kernel keeps all decoder state resident in
VMEM for the whole iteration loop, with a TPU-native data layout:

  * batch lives in the LANE dimension: all per-edge/per-variable arrays are
    (rows, BT) with BT a multiple of 128 — every elementwise op is a full
    8x128 VPU tile;
  * messages are stored as dc slot-planes (dc, m, BT), so the leave-one-out
    check update is dc static 2-D multiplies (no minor-dim-6 tensors, no
    gathers);
  * the variable-side scatter/gather becomes two one-hot matmuls on the MXU:
    R_sum = M_ve @ R_flat and V_edges = M_ev @ values, with M_* static 0/1
    matrices baked from the Tanner graph (phantom slots have all-zero rows,
    so padding never pollutes sums — supports irregular checks);
  * the syndrome check is H @ hard on the MXU + parity;
  * per-sample convergence freeze matches decoders/bp.py exactly, and a
    whole-tile early exit flag in SMEM skips remaining iterations via
    ``pl.when`` once every lane in the tile has converged.

Semantics parity: identical to BPDecoder's sum-product/min-sum updates
(which themselves mirror the reference math of
decoding/beliefPropagation.py:110-126 and rework/decoding.py:26-67).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qldpc_tpu.ops.tanner import TannerGraph

__all__ = ["PallasBPKernel", "recommended_batch_tile"]


def recommended_batch_tile(p: float | None = None) -> int:
    """Measured-best batch tile for the fused kernel at error rate ``p``.

    From the TPU v5e sweep in scripts/autotune_tile.py
    (results/autotune_tile.json, 262k batch, BP(50), one process): at low p
    the whole-tile early exit fires sooner with fewer lanes per tile
    (bt=128 beats 1024 by 2.1x at p=0.01), while at high p almost nothing
    converges early and wide tiles amortize grid overhead (bt=1024 beats
    128 by 1.5-1.7x at p >= 0.03). ``None`` returns the balanced default.
    """
    if p is None:
        return 256
    if p < 0.02:
        return 128
    if p < 0.03:
        return 256
    return 1024

_TANH_CLIP = 0.9999999
_BIG = 1e9  # phantom-slot message: tanh(BIG/2) == 1 (neutral), |.| == huge


def _arctanh(x):
    """atanh via its log identity — Mosaic has no atanh lowering. Inputs are
    pre-clipped to ±_TANH_CLIP so 1-x stays >= ~6e-8 (safe in f32)."""
    return 0.5 * jnp.log((1.0 + x) / (1.0 - x))


class _Tables(NamedTuple):
    M_ve: np.ndarray  # (n, E') var-sum one-hot, E' = dc*m slot-major
    M_ev: np.ndarray  # (E', n) edge-broadcast one-hot
    H: np.ndarray  # (m, n) float parity-check
    mask: np.ndarray  # (E', 1) 1.0 for real edges, 0.0 for phantom slots


def _build_tables(g: TannerGraph) -> _Tables:
    m, n, dc = g.m, g.n, g.dc_max
    Ep = dc * m  # slot-major padded edge space: index = slot * m + check
    M_ve = np.zeros((n, Ep), np.float32)
    M_ev = np.zeros((Ep, n), np.float32)
    mask = np.zeros((Ep, 1), np.float32)
    for c in range(m):
        for slot in range(dc):
            e = g.check_edge[c, slot]
            if e == g.num_edges:  # phantom
                continue
            v = g.var_of_edge[e]
            idx = slot * m + c
            M_ve[v, idx] = 1.0
            M_ev[idx, v] = 1.0
            mask[idx, 0] = 1.0
    return _Tables(M_ve=M_ve, M_ev=M_ev, H=g.H.astype(np.float32), mask=mask)


class _LayeredTables(NamedTuple):
    M_ve: np.ndarray  # (L, n, Epl) per-layer var-sum one-hot
    M_ev: np.ndarray  # (L, Epl, n) per-layer edge-broadcast one-hot
    H: np.ndarray  # (m, n)


def _build_layered_tables(g: TannerGraph, L: int) -> _LayeredTables:
    m, n, dc = g.m, g.n, g.dc_max
    if not g.check_regular:
        raise ValueError("layered kernel requires a check-regular graph")
    if m % L:
        raise ValueError(f"n_layers={L} must divide m={m}")
    lm = m // L
    Epl = dc * lm  # within-layer slot-major: idx = slot * lm + (c - c0)
    M_ve = np.zeros((L, n, Epl), np.float32)
    M_ev = np.zeros((L, Epl, n), np.float32)
    for c in range(m):
        layer, cl = divmod(c, lm)
        for slot in range(dc):
            v = g.var_of_edge[g.check_edge[c, slot]]
            idx = slot * lm + cl
            M_ve[layer, v, idx] = 1.0
            M_ev[layer, idx, v] = 1.0
    return _LayeredTables(M_ve=M_ve, M_ev=M_ev, H=g.H.astype(np.float32))


def _bp_layered_kernel(
    # inputs
    syn_ref,  # (m, BT)
    priors_ref,  # (n, BT)
    mve_ref,  # (L, n, Epl)
    mev_ref,  # (L, Epl, n)
    h_ref,  # (m, n)
    # outputs
    values_ref,  # (n, BT)
    conv_ref,  # (1, BT)
    iters_ref,  # (1, BT)
    # scratch
    r_ref,  # (dc, m, BT) check->var messages (zero-init)
    done_ref,  # (1,) int32 SMEM
    *,
    m: int,
    n: int,
    dc: int,
    L: int,
    bt: int,
    max_iter: int,
    method: str,
    alpha: float,
    offset: float,
    clip_llr: float | None,
):
    """Check-serial schedule in VMEM: per layer, Q is recomputed from the
    *current* posteriors (Q = M_ev_l @ values - R_l), the check rule runs on
    dc static (lm, BT) slot planes, and posteriors absorb the message delta
    immediately (values += M_ve_l @ (R_new - R_old)). Semantics match
    decoders/bp.py::_build_layered exactly (tests/test_pallas.py)."""
    lm = m // L
    ssign = 1.0 - 2.0 * syn_ref[:]  # (m, BT)

    values_ref[:] = priors_ref[:]
    r_ref[:] = jnp.zeros((dc, m, bt), jnp.float32)
    conv_ref[:] = jnp.zeros((1, bt), jnp.float32)
    iters_ref[:] = jnp.full((1, bt), float(max(max_iter - 1, 0)), jnp.float32)
    done_ref[0] = 0

    def iteration(it, _):
        @pl.when(done_ref[0] == 0)
        def _():
            vals = values_ref[:]
            for layer in range(L):
                c0 = layer * lm
                v_edges = jnp.dot(
                    mev_ref[layer], vals, preferred_element_type=jnp.float32
                )  # (Epl, BT)
                r_old = [r_ref[i, c0:c0 + lm] for i in range(dc)]
                q = []
                for i in range(dc):
                    qi = v_edges[i * lm:(i + 1) * lm] - r_old[i]
                    if clip_llr is not None:
                        qi = jnp.clip(qi, -clip_llr, clip_llr)
                    q.append(qi)
                ss = ssign[c0:c0 + lm]

                if method == "sum-product":
                    t = [jnp.tanh(qi * 0.5) for qi in q]
                    r_new = []
                    for i in range(dc):
                        others = None
                        for j in range(dc):
                            if j == i:
                                continue
                            others = t[j] if others is None else others * t[j]
                        clipped = jnp.clip(others * ss, -_TANH_CLIP, _TANH_CLIP)
                        r_new.append(2.0 * _arctanh(clipped))
                else:  # min-sum
                    one = jnp.float32(1.0)
                    sg = [jnp.where(qi >= 0, one, -one) for qi in q]
                    aq = [jnp.abs(qi) for qi in q]
                    min1 = aq[0]
                    amin = jnp.zeros_like(aq[0])
                    for i in range(1, dc):
                        better = aq[i] < min1
                        min1 = jnp.where(better, aq[i], min1)
                        amin = jnp.where(better, float(i), amin)
                    min2 = None
                    for i in range(dc):
                        masked = jnp.where(amin == float(i), jnp.inf, aq[i])
                        min2 = masked if min2 is None else jnp.minimum(min2, masked)
                    r_new = []
                    for i in range(dc):
                        osign = None
                        for j in range(dc):
                            if j == i:
                                continue
                            osign = sg[j] if osign is None else osign * sg[j]
                        mags = jnp.where(amin == float(i), min2, min1)
                        if offset:
                            mags = jnp.maximum(mags - offset, 0.0)
                        r_new.append(ss * osign * mags)

                if alpha != 1.0:
                    r_new = [r * alpha for r in r_new]

                delta = jnp.concatenate(
                    [
                        (r_new[i] - r_old[i]).reshape(1, lm, bt)
                        for i in range(dc)
                    ],
                    axis=0,
                ).reshape(dc * lm, bt)
                vals = vals + jnp.dot(
                    mve_ref[layer], delta, preferred_element_type=jnp.float32
                )
                for i in range(dc):
                    r_ref[i, c0:c0 + lm] = r_new[i]

            # ---- hard decision + syndrome check + freeze (as flooding) ------
            hard = (vals < 0).astype(jnp.float32)
            counts = jnp.dot(h_ref[:], hard, preferred_element_type=jnp.float32)
            parity = counts - 2.0 * jnp.floor(counts * 0.5)
            eq = (parity == syn_ref[:]).astype(jnp.float32)
            ok = jnp.min(eq, axis=0, keepdims=True)

            conv_prev = conv_ref[:]
            not_frozen = conv_prev < 0.5
            values_ref[:] = jnp.where(not_frozen, vals, values_ref[:])
            iters_ref[:] = jnp.where(
                not_frozen, it.astype(jnp.float32), iters_ref[:]
            )
            conv_now = jnp.maximum(conv_prev, ok)
            conv_ref[:] = conv_now
            done_ref[0] = jnp.min(conv_now).astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, max_iter, iteration, 0)


def _bp_kernel(
    # inputs
    syn_ref,  # (m, BT) f32 0/1 syndrome
    priors_ref,  # (n, BT) f32
    mve_ref,  # (n, Ep)
    mev_ref,  # (Ep, n)
    h_ref,  # (m, n)
    mask_ref,  # (Ep, 1)
    # outputs
    values_ref,  # (n, BT) f32 posterior LLRs (frozen at convergence)
    conv_ref,  # (1, BT) f32 0/1
    iters_ref,  # (1, BT) f32 iteration index at convergence
    # scratch
    q_ref,  # (dc, m, BT) f32 var->check messages
    done_ref,  # (1,) int32 SMEM whole-tile early exit
    *,
    m: int,
    n: int,
    dc: int,
    bt: int,
    max_iter: int,
    method: str,
    alpha: float,
    offset: float,
    damping: float,
    clip_llr: float | None,
    early_exit: bool = True,
    mm_bf16: bool = False,
):
    Ep = dc * m
    ssign = 1.0 - 2.0 * syn_ref[:]  # (m, BT)

    # bf16-MXU mode (docs/bp_roofline.md: the kernel is MXU-bound at 84%
    # of the f32 roofline, and the one-hot tables are EXACT 0/1 in bf16):
    # matmul data operands round to bf16, accumulation stays f32
    # (preferred_element_type), all VPU message math stays f32. The
    # syndrome check stays exact — hard decisions are 0/1 (exact in bf16)
    # and the f32 accumulator holds integer counts < 2^24 exactly — so
    # convergence detection semantics are unchanged; only message rounding
    # differs (same trade as the DEM kernel's stream_dtype="bfloat16").
    mm = jnp.bfloat16 if mm_bf16 else jnp.float32
    cast = lambda x: x.astype(mm)

    # init: Q = prior at each real edge (phantom slots pinned to BIG)
    prior_edges = jnp.dot(
        mev_ref[:], cast(priors_ref[:]), preferred_element_type=jnp.float32
    )  # (Ep, BT)
    q0 = jnp.where(mask_ref[:] > 0, prior_edges, _BIG)
    q_ref[:] = q0.reshape(dc, m, bt)
    values_ref[:] = priors_ref[:]
    conv_ref[:] = jnp.zeros((1, bt), jnp.float32)
    iters_ref[:] = jnp.full((1, bt), float(max(max_iter - 1, 0)), jnp.float32)
    done_ref[0] = 0

    def iteration(it, _):
        def body():
            # ---- check update: leave-one-out over dc static slot planes ----
            if method == "sum-product":
                t = [jnp.tanh(q_ref[i] * 0.5) for i in range(dc)]
                r_planes = []
                for i in range(dc):
                    others = None
                    for j in range(dc):
                        if j == i:
                            continue
                        others = t[j] if others is None else others * t[j]
                    clipped = jnp.clip(others * ssign, -_TANH_CLIP, _TANH_CLIP)
                    r_planes.append(2.0 * _arctanh(clipped))
            else:  # min-sum
                one = jnp.float32(1.0)
                sg = [jnp.where(q_ref[i] >= 0, one, -one) for i in range(dc)]
                aq = [jnp.abs(q_ref[i]) for i in range(dc)]
                # two smallest magnitudes + first-argmin tracking, slot-wise
                min1 = aq[0]
                amin = jnp.zeros_like(aq[0])
                for i in range(1, dc):
                    better = aq[i] < min1
                    min1 = jnp.where(better, aq[i], min1)
                    amin = jnp.where(better, float(i), amin)
                min2 = None
                for i in range(dc):
                    masked = jnp.where(amin == float(i), jnp.inf, aq[i])
                    min2 = masked if min2 is None else jnp.minimum(min2, masked)
                r_planes = []
                for i in range(dc):
                    osign = None
                    for j in range(dc):
                        if j == i:
                            continue
                        osign = sg[j] if osign is None else osign * sg[j]
                    mags = jnp.where(amin == float(i), min2, min1)
                    if offset:
                        mags = jnp.maximum(mags - offset, 0.0)
                    r_planes.append(ssign * osign * mags)

            if alpha != 1.0:
                r_planes = [r * alpha for r in r_planes]
            r_flat = jnp.concatenate(
                [r.reshape(1, m, bt) for r in r_planes], axis=0
            ).reshape(Ep, bt)
            r_flat = r_flat * mask_ref[:]  # zero phantom contributions

            # ---- variable update: two one-hot MXU matmuls -------------------
            r_sum = jnp.dot(
                mve_ref[:], cast(r_flat), preferred_element_type=jnp.float32
            )
            values = r_sum + priors_ref[:]  # (n, BT)
            v_edges = jnp.dot(
                mev_ref[:], cast(values), preferred_element_type=jnp.float32
            )
            q_new = v_edges - r_flat
            if damping != 1.0:
                q_old = q_ref[:].reshape(Ep, bt)
                q_new = damping * q_new + (1.0 - damping) * q_old
            if clip_llr is not None:
                q_new = jnp.clip(q_new, -clip_llr, clip_llr)
            q_new = jnp.where(mask_ref[:] > 0, q_new, _BIG)
            q_ref[:] = q_new.reshape(dc, m, bt)

            # ---- hard decision + syndrome check on MXU ----------------------
            hard = (values < 0).astype(mm)  # 0/1: exact in bf16
            counts = jnp.dot(h_ref[:], hard, preferred_element_type=jnp.float32)
            parity = counts - 2.0 * jnp.floor(counts * 0.5)
            eq = (parity == syn_ref[:]).astype(jnp.float32)
            ok = jnp.min(eq, axis=0, keepdims=True)  # (1, BT) all-checks match

            conv_prev = conv_ref[:]  # (1, BT)
            not_frozen = conv_prev < 0.5
            values_ref[:] = jnp.where(not_frozen, values, values_ref[:])
            iters_ref[:] = jnp.where(
                not_frozen, it.astype(jnp.float32), iters_ref[:]
            )
            conv_now = jnp.maximum(conv_prev, ok)
            conv_ref[:] = conv_now
            if early_exit:
                done_ref[0] = jnp.min(conv_now).astype(jnp.int32)

        if early_exit:
            pl.when(done_ref[0] == 0)(body)
        else:
            # fixed-trip mode (bench raw-kernel figure): per-lane freeze
            # keeps the outputs identical; only the whole-tile skip is off
            body()
        return 0

    jax.lax.fori_loop(0, max_iter, iteration, 0)


class PallasBPKernel:
    """Compiled fused-BP callable for a fixed Tanner graph + config.

    ``__call__(syndromes (B, m) int, priors (B, n) f32)`` returns
    ``(values (B, n) f32, converged (B,) bool, iterations (B,) int32)``.
    Batch is tiled over a 1-D grid; each tile's state lives in VMEM.
    """

    def __init__(
        self,
        graph: TannerGraph,
        *,
        max_iter: int,
        method: str = "sum-product",
        alpha: float = 1.0,
        offset: float = 0.0,
        damping: float = 1.0,
        clip_llr: float | None = None,
        batch_tile: int = 256,
        schedule: str = "flooding",
        n_layers: int = 0,
        interpret: bool = False,
        early_exit: bool = True,
        mm_dtype: str = "float32",
    ):
        self.graph = graph
        self.batch_tile = batch_tile
        self.schedule = schedule
        if mm_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown mm_dtype {mm_dtype!r}")
        if mm_dtype != "float32" and schedule == "layered":
            raise ValueError("mm_dtype=bfloat16 supports the flooding "
                             "schedule only")
        self.mm_dtype = mm_dtype
        m, n, dc = graph.m, graph.n, graph.dc_max
        Ep = dc * m

        if schedule == "layered":
            if damping != 1.0:
                raise ValueError("damping unsupported with layered schedule")
            L = n_layers or next((k for k in (4, 3, 2) if m % k == 0), 1)
            self._L = L
            self._tables = _build_layered_tables(graph, L)
            kernel = functools.partial(
                _bp_layered_kernel,
                m=m,
                n=n,
                dc=dc,
                L=L,
                bt=batch_tile,
                max_iter=max_iter,
                method=method,
                alpha=alpha,
                offset=offset,
                clip_llr=clip_llr,
            )
        else:
            self._L = 0
            self._tables = _build_tables(graph)
            kernel = functools.partial(
                _bp_kernel,
                m=m,
                n=n,
                dc=dc,
                bt=batch_tile,
                max_iter=max_iter,
                method=method,
                alpha=alpha,
                offset=offset,
                damping=damping,
                clip_llr=clip_llr,
                early_exit=early_exit,
                mm_bf16=mm_dtype == "bfloat16",
            )

        # pallas_call grids are static; built lazily per batch size
        self._m, self._n, self._dc, self._Ep = m, n, dc, Ep
        self._interpret = interpret
        self._kernel = kernel

    @functools.lru_cache(maxsize=8)
    def _built(self, n_tiles: int):
        m, n, dc, Ep = self._m, self._n, self._dc, self._Ep
        bt = self.batch_tile

        tile = lambda rows: pl.BlockSpec(
            (rows, bt), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        full = lambda *dims: pl.BlockSpec(
            dims, (lambda i: (0, 0, 0) if len(dims) == 3 else (0, 0)),
            memory_space=pltpu.VMEM,
        )
        if self.schedule == "layered":
            L = self._L
            Epl = Ep // L
            in_specs = [
                tile(m),  # syndromes
                tile(n),  # priors
                full(L, n, Epl),
                full(L, Epl, n),
                full(m, n),
            ]
        else:
            in_specs = [
                tile(m),  # syndromes
                tile(n),  # priors
                full(n, Ep),
                full(Ep, n),
                full(m, n),
                full(Ep, 1),
            ]
        return pl.pallas_call(
            self._kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=(tile(n), tile(1), tile(1)),
            out_shape=(
                jax.ShapeDtypeStruct((n, n_tiles * bt), jnp.float32),
                jax.ShapeDtypeStruct((1, n_tiles * bt), jnp.float32),
                jax.ShapeDtypeStruct((1, n_tiles * bt), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((dc, m, bt), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
            ],
            interpret=self._interpret,
        )

    def __call__(self, syndromes: jax.Array, priors: jax.Array):
        B = syndromes.shape[0]
        bt = self.batch_tile
        pad = (-B) % bt
        n_tiles = (B + pad) // bt
        t = self._tables

        syn_t = jnp.pad(syndromes.astype(jnp.float32), ((0, pad), (0, 0))).T
        priors_b = jnp.broadcast_to(priors, (B, self._n)).astype(jnp.float32)
        priors_t = jnp.pad(priors_b, ((0, pad), (0, 0)), constant_values=1.0).T

        if self.schedule == "layered":
            operands = (
                jnp.asarray(t.M_ve),
                jnp.asarray(t.M_ev),
                jnp.asarray(t.H),
            )
        else:
            # bf16-MXU mode: the one-hot tables and H are exact 0/1 in
            # bf16, so casting them is lossless and halves their VMEM
            mm = jnp.bfloat16 if self.mm_dtype == "bfloat16" else jnp.float32
            operands = (
                jnp.asarray(t.M_ve, mm),
                jnp.asarray(t.M_ev, mm),
                jnp.asarray(t.H, mm),
                jnp.asarray(t.mask),
            )
        values_t, conv_t, iters_t = self._built(n_tiles)(
            syn_t, priors_t, *operands
        )
        values = values_t.T[:B]
        conv = conv_t[0, :B] > 0.5
        iters = iters_t[0, :B].astype(jnp.int32)
        return values, conv, iters
