"""Compile-crash envelope guards + factored-eliminator overflow surfacing.

Round-4 VERDICT item 6: the measured TPU compile-crash operating points
(results/bench_circuit144_r4.json — every ck16 cell and both B1024 e2e
cells are remote-compile HTTP 500s) must be explicit errors, not CLAUDE.md
folklore. Round-4 ADVICE item 3: a factored-eliminator lane that exhausts
its column budget must fail loudly (solution falls back to ``hard`` so the
engine classifies it as a decode failure), not silently return a wrong
correction.
"""

import dataclasses

import jax
import numpy as np
import pytest

from qldpc_tpu.decoders.bp import BPConfig
from qldpc_tpu.decoders.osd import OSDConfig, OSDDecoder
from qldpc_tpu.ops.dem_bp_pallas import DEMPallasBPKernel
from qldpc_tpu.ops.osd_factored import FactoredEliminator
from qldpc_tpu.ops.tanner import TannerGraph


def _big_dem_H(m=1600, n=2000, dc=316):
    """Cheap synthetic H matching the [[144,12,12]] DEM's guard-relevant
    geometry: dc_max 316 -> dc_pad 320, m_pad * dc_pad = 512k >= 500k."""
    H = np.zeros((m, n), np.uint8)
    for r in range(m):
        H[r, (r * 7 + np.arange(dc) * 5) % n] = 1
    return H


def test_dem_kernel_ck16_guard():
    g = TannerGraph.from_H(_big_dem_H())
    with pytest.raises(ValueError, match="compile envelope"):
        DEMPallasBPKernel(g, max_iter=10, check_chunk=16)
    # the measured-good operating point still constructs
    k = DEMPallasBPKernel(g, max_iter=10, check_chunk=8)
    assert k._ck == 8
    # interpret mode (CPU correctness path) is exempt
    DEMPallasBPKernel(g, max_iter=10, check_chunk=16, interpret=True)


def test_dem_engine_batch_guard():
    from qldpc_tpu.mc.dem_engine import DEMEngine, DEMEngineConfig
    from qldpc_tpu.noise.dem import DEMData

    H = _big_dem_H()
    priors = np.full(H.shape[1], 1e-3)
    dem = DEMData(
        H=H, L=np.zeros((2, H.shape[1]), np.uint8), priors=priors
    )
    nd = len(jax.devices())  # guard is per-DEVICE lane count
    cfg = DEMEngineConfig(
        bp=BPConfig(max_iter=10, backend="pallas"),
        osd=None,
        batch_size=1024 * nd,
    )
    with pytest.raises(ValueError, match="compile envelope"):
        DEMEngine(dem, cfg)
    # 512 lanes/device is inside the measured-good region
    eng = DEMEngine(dem, dataclasses.replace(cfg, batch_size=512 * nd))
    assert eng.local_batch == 512


def _overflow_case(rng, m=40, n=640, batch=6, dead=200):
    """The eliminator's minimum effective budget is one K=128 column
    block, so overflow needs >=128 leading pivot-free columns: the first
    ``dead`` columns are zero columns of H given the smallest |llr|, so
    every lane burns its whole budget on them and resolves nothing."""
    H = (rng.random((m - 3, n)) < 0.05).astype(np.uint8)
    H[:, dead : dead + m - 3] |= np.eye(m - 3, dtype=np.uint8)
    H[:, :dead] = 0
    H = np.vstack([H, H[:3]])
    errors = (rng.random((batch, n)) < 0.05).astype(np.int8)
    errors[:, :dead] = 0
    syndromes = ((errors @ H.T) % 2).astype(np.int8)
    llrs = (rng.normal(size=(batch, n)) * 3.0).astype(np.float32)
    llrs[:, :dead] = 1e-3  # zero columns sort first
    hard = np.zeros((batch, n), np.int8)
    return H, syndromes, llrs, hard


def test_factored_overflow_lanes_fail_loudly():
    rng = np.random.default_rng(20260821)
    H, syndromes, llrs, hard = _overflow_case(rng)
    from qldpc_tpu import native

    rank = int(native.rank(H))
    dec = OSDDecoder(H, OSDConfig(order=0, backend="lanes"))
    # force the factored path with a starved column budget (the public
    # constructor auto-raises the budget to rank+512 precisely so this
    # cannot happen in normal operation)
    dec.backend = "factored"
    dec._factored = FactoredEliminator(
        H, h_rank=rank, max_cols=8, interpret=True
    )
    dec._decode = jax.jit(dec._osd0_lanes)

    order = np.argsort(np.abs(llrs), axis=1, kind="stable").astype(np.int32)
    _, _, _, overflow = dec._factored(order, syndromes.T.astype(np.uint32))
    overflow = np.asarray(overflow)
    assert overflow.any(), "test needs at least one starved lane"

    sol = np.asarray(dec(syndromes, llrs, hard))
    # overflowed lanes return `hard` unchanged -> unresolved syndrome ->
    # the engine counts a failure instead of accepting a wrong solve
    np.testing.assert_array_equal(sol[overflow], hard[overflow])


def test_factored_kernel2_fit_model_shrinks_or_raises():
    # a tall/wide synthetic system whose rank+slack budget inflates s_max:
    # the kernel-2 resident model must keep the config under 16 MB (by
    # shrinking cwp and/or K) or raise descriptively — never hand Mosaic
    # an over-budget program (round-4 ADVICE item 2)
    # m = 6400: the elimination kernel fits at K=64 (10.1 MB), but
    # kernel 2's Y block (s_max 7168, kw=2, 7.3 MB) + cwp=32 C panels
    # (8.4 MB) would be 16.3 MB — the model must shrink cwp to 16
    # (12.1 MB) instead of handing Mosaic an over-budget program
    m, n = 6400, 6784
    H = np.zeros((m, n), np.uint8)
    H[np.arange(m), np.arange(m)] = 1
    fe = FactoredEliminator(H, h_rank=m - 1, max_cols=m - 1 + 512)
    resident = (
        2 * fe.mp * fe.cwp * fe.bt * 4
        + fe.s_max * fe.kw * fe.bt * 4
        + 2 * fe.mp * fe.kw * fe.bt * 4
    )
    assert resident <= 16.0e6
    assert fe.cwp < 32  # the shrink actually happened
    assert fe.s_max >= m - 1  # the column budget itself must not shrink
