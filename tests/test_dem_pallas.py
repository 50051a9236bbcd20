"""Streamed DEM-scale Pallas BP kernel vs the XLA slot path.

The contract (VERDICT round-2 item 1): on irregular/DEM graphs,
backend="pallas" must reproduce the XLA slot path's decisions —
converged / iterations / hard — exactly, with posterior LLRs equal to
float32 reduction-order tolerance."""

import numpy as np
import pytest

from qldpc_tpu.codes import get_code
from qldpc_tpu.decoders import BPConfig, BPDecoder


def _irregular_H(rng, m=24, n=160, deg=24):
    H = np.zeros((m, n), np.uint8)
    for c in range(m):
        H[c, rng.choice(n, size=deg + int(rng.integers(0, 5)) - 2,
                        replace=False)] = 1
    # ensure no empty columns
    empty = np.flatnonzero(H.sum(0) == 0)
    for v in empty:
        H[rng.integers(0, m), v] = 1
    return H


def _dem_H():
    from qldpc_tpu.noise.circuit import memory_experiment_dem

    code = get_code("steane")
    return memory_experiment_dem(code, p=0.01, rounds=3)


def _compare(H, syn, prior, cfg_kw):
    xla = BPDecoder(H, BPConfig(backend="xla", **cfg_kw))(syn, prior)
    pal = BPDecoder(H, BPConfig(backend="pallas", **cfg_kw))(syn, prior)
    assert np.array_equal(np.asarray(xla.converged), np.asarray(pal.converged))
    assert np.array_equal(np.asarray(xla.iterations), np.asarray(pal.iterations))
    assert np.array_equal(np.asarray(xla.hard), np.asarray(pal.hard))
    # LLRs: f32 reduction orders differ between the kernel's (ck, dcp, bt)
    # reduces and XLA's — converged lanes freeze early and must agree
    # tightly; non-converged trajectories compound the rounding chaotically
    # (decisions above are still exactly equal)
    conv = np.asarray(xla.converged)
    a, b = np.asarray(xla.llrs)[conv], np.asarray(pal.llrs)[conv]
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("method", ["sum-product", "min-sum"])
def test_irregular_graph_matches_xla(rng, method):
    H = _irregular_H(rng)
    p = 0.03
    prior = np.full(H.shape[1], np.log((1 - p) / p), np.float32)
    errors = (rng.random((96, H.shape[1])) < p).astype(np.int8)
    syn = (errors @ H.T) % 2
    _compare(H, syn, prior, dict(max_iter=20, method=method))


@pytest.mark.parametrize("method", ["sum-product", "min-sum"])
def test_steane_circuit_dem_matches_xla(rng, method):
    dem = _dem_H()
    H = dem.H
    mech = (rng.random((64, H.shape[1])) < dem.priors[None, :]).astype(np.int8)
    syn = (mech @ H.T) % 2
    _compare(H, syn, dem.llrs.astype(np.float32), dict(max_iter=15, method=method))


def test_alpha_offset_clip_matches_xla(rng):
    H = _irregular_H(rng)
    p = 0.03
    prior = np.full(H.shape[1], np.log((1 - p) / p), np.float32)
    errors = (rng.random((64, H.shape[1])) < p).astype(np.int8)
    syn = (errors @ H.T) % 2
    _compare(
        H, syn, prior,
        dict(max_iter=16, method="min-sum", alpha=0.8, offset=0.3,
             clip_llr=25.0),
    )


def test_chunked_early_exit_matches_full(rng):
    dem = _dem_H()
    H = dem.H
    mech = (rng.random((64, H.shape[1])) < dem.priors[None, :]).astype(np.int8)
    syn = (mech @ H.T) % 2
    prior = dem.llrs.astype(np.float32)
    full = BPDecoder(H, BPConfig(backend="pallas", max_iter=16))(syn, prior)
    chunked = BPDecoder(
        H, BPConfig(backend="pallas", max_iter=16, chunk_size=4)
    )(syn, prior)
    assert np.array_equal(np.asarray(full.converged), np.asarray(chunked.converged))
    assert np.array_equal(np.asarray(full.iterations), np.asarray(chunked.iterations))
    assert np.array_equal(np.asarray(full.hard), np.asarray(chunked.hard))


@pytest.mark.parametrize("method", ["sum-product", "min-sum"])
def test_bf16_streams(rng, method):
    """stream_dtype="bfloat16" halves HBM traffic; compute stays f32.

    Decisions may legitimately differ from the f32 path on near-tie
    roundings, so the contract here is (a) self-consistency — every lane
    reported converged satisfies its syndrome exactly — and (b) posterior
    LLRs close to the f32 kernel on lanes both paths converged."""
    dem = _dem_H()
    H = dem.H
    mech = (rng.random((96, H.shape[1])) < dem.priors[None, :]).astype(np.int8)
    syn = (mech @ H.T) % 2
    prior = dem.llrs.astype(np.float32)
    f32 = BPDecoder(
        H, BPConfig(backend="pallas", max_iter=15, method=method)
    )(syn, prior)
    bf16 = BPDecoder(
        H,
        BPConfig(
            backend="pallas", max_iter=15, method=method,
            stream_dtype="bfloat16",
        ),
    )(syn, prior)
    conv = np.asarray(bf16.converged)
    hard = np.asarray(bf16.hard)
    assert conv.any()  # Steane DEM at p=0.01 converges readily
    resid = (hard @ H.T) % 2
    assert np.array_equal(resid[conv], np.asarray(syn)[conv])
    both = conv & np.asarray(f32.converged)
    a = np.asarray(f32.llrs)[both]
    b = np.asarray(bf16.llrs)[both]
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.25)


def test_stream_dtype_guards():
    from qldpc_tpu.codes import get_code as _gc

    with pytest.raises(ValueError):
        BPConfig(backend="xla", stream_dtype="bfloat16")
    with pytest.raises(ValueError):
        BPConfig(backend="pallas", stream_dtype="float16")
    # regular (fused-kernel) graphs have no HBM message streams
    Hx = _gc("steane").Hx
    with pytest.raises(ValueError):
        BPDecoder(Hx, BPConfig(backend="pallas", stream_dtype="bfloat16"))


def test_non_multiple_of_128_batch(rng):
    """Lane padding: B=50 must give the same answers as the XLA path."""
    H = _irregular_H(rng)
    p = 0.04
    prior = np.full(H.shape[1], np.log((1 - p) / p), np.float32)
    errors = (rng.random((50, H.shape[1])) < p).astype(np.int8)
    syn = (errors @ H.T) % 2
    _compare(H, syn, prior, dict(max_iter=12, method="min-sum"))
