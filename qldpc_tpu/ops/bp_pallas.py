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
):
    Ep = dc * m
    ssign = 1.0 - 2.0 * syn_ref[:]  # (m, BT)

    # init: Q = prior at each real edge (phantom slots pinned to BIG)
    prior_edges = jnp.dot(
        mev_ref[:], priors_ref[:], preferred_element_type=jnp.float32
    )  # (Ep, BT)
    q0 = jnp.where(mask_ref[:] > 0, prior_edges, _BIG)
    q_ref[:] = q0.reshape(dc, m, bt)
    values_ref[:] = priors_ref[:]
    conv_ref[:] = jnp.zeros((1, bt), jnp.float32)
    iters_ref[:] = jnp.full((1, bt), float(max(max_iter - 1, 0)), jnp.float32)
    done_ref[0] = 0

    def iteration(it, _):
        @pl.when(done_ref[0] == 0)
        def _():
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
            r_sum = jnp.dot(mve_ref[:], r_flat, preferred_element_type=jnp.float32)
            values = r_sum + priors_ref[:]  # (n, BT)
            v_edges = jnp.dot(
                mev_ref[:], values, preferred_element_type=jnp.float32
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
            hard = (values < 0).astype(jnp.float32)
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
            done_ref[0] = jnp.min(conv_now).astype(jnp.int32)

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
        interpret: bool = False,
    ):
        self.graph = graph
        self.batch_tile = batch_tile
        t = _build_tables(graph)
        self._tables = t
        m, n, dc = graph.m, graph.n, graph.dc_max
        Ep = dc * m

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
        full = lambda r, c: pl.BlockSpec(
            (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            self._kernel,
            grid=(n_tiles,),
            in_specs=[
                tile(m),  # syndromes
                tile(n),  # priors
                full(n, Ep),
                full(Ep, n),
                full(m, n),
                full(Ep, 1),
            ],
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

        values_t, conv_t, iters_t = self._built(n_tiles)(
            syn_t,
            priors_t,
            jnp.asarray(t.M_ve),
            jnp.asarray(t.M_ev),
            jnp.asarray(t.H),
            jnp.asarray(t.mask),
        )
        values = values_t.T[:B]
        conv = conv_t[0, :B] > 0.5
        iters = iters_t[0, :B].astype(jnp.int32)
        return values, conv, iters
