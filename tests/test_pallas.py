"""Pallas fused-BP kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

from qldpc_tpu.codes import get_code
from qldpc_tpu.decoders import BPConfig, BPDecoder
from qldpc_tpu.noise.spacetime import space_time_matrix


def sample(rng, H, p, batch):
    n = H.shape[1]
    errors = (rng.random((batch, n)) < p).astype(np.int8)
    return (errors @ H.T) % 2


@pytest.mark.parametrize("method", ["sum-product", "min-sum"])
def test_pallas_matches_xla(rng, method):
    code = get_code("[[72, 12, 6]]")
    H = code.Hx
    syn = sample(rng, H, 0.05, batch=256)
    prior = np.full(code.n, np.log(0.95 / 0.05), np.float32)
    xla = BPDecoder(H, BPConfig(max_iter=25, method=method))(syn, prior)
    pal = BPDecoder(
        H, BPConfig(max_iter=25, method=method, backend="pallas", batch_tile=128)
    )(syn, prior)
    assert np.array_equal(np.asarray(xla.converged), np.asarray(pal.converged))
    assert np.array_equal(np.asarray(xla.iterations), np.asarray(pal.iterations))
    assert np.array_equal(np.asarray(xla.hard), np.asarray(pal.hard))


def test_pallas_fixed_trip_matches_early_exit(rng):
    """early_exit=False (the bench raw-kernel mode) only disables the
    whole-tile skip; the per-lane freeze keeps every output bit-identical."""
    import jax

    from qldpc_tpu.ops.bp_pallas import PallasBPKernel

    code = get_code("steane")
    H = code.Hx
    syn = sample(rng, H, 0.08, batch=128)
    prior = np.full(7, np.log(0.92 / 0.08), np.float32)
    dec = BPDecoder(H, BPConfig(max_iter=16))
    interp = jax.default_backend() == "cpu"
    out = [
        PallasBPKernel(
            dec.graph, max_iter=16, batch_tile=128, interpret=interp,
            early_exit=ee,
        )(syn, prior)
        for ee in (True, False)
    ]
    for a, b in zip(out[0], out[1]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pallas_damped_clipped(rng):
    code = get_code("steane")
    H = code.Hx
    syn = sample(rng, H, 0.08, batch=128)
    prior = np.full(7, np.log(0.92 / 0.08), np.float32)
    kw = dict(max_iter=16, alpha=0.8, damping=0.7, clip_llr=25.0)
    xla = BPDecoder(H, BPConfig(**kw))(syn, prior)
    pal = BPDecoder(H, BPConfig(backend="pallas", batch_tile=128, **kw))(syn, prior)
    assert np.array_equal(np.asarray(xla.converged), np.asarray(pal.converged))
    assert np.array_equal(np.asarray(xla.hard), np.asarray(pal.hard))


def test_pallas_offset_min_sum(rng):
    code = get_code("steane")
    H = code.Hx
    syn = sample(rng, H, 0.08, batch=128)
    prior = np.full(7, np.log(0.92 / 0.08), np.float32)
    kw = dict(max_iter=16, method="min-sum", offset=0.4, damping=0.8)
    xla = BPDecoder(H, BPConfig(**kw))(syn, prior)
    pal = BPDecoder(H, BPConfig(backend="pallas", batch_tile=128, **kw))(syn, prior)
    assert np.array_equal(np.asarray(xla.converged), np.asarray(pal.converged))
    assert np.array_equal(np.asarray(xla.iterations), np.asarray(pal.iterations))
    assert np.array_equal(np.asarray(xla.hard), np.asarray(pal.hard))


@pytest.mark.parametrize("method", ["sum-product", "min-sum"])
def test_pallas_layered_matches_xla_layered(rng, method):
    """The fused check-serial kernel must agree with the XLA layered path
    bit-for-bit on decisions (same layer partition, same freeze)."""
    code = get_code("[[72, 12, 6]]")
    H = code.Hx
    syn = sample(rng, H, 0.05, batch=256)
    prior = np.full(code.n, np.log(0.95 / 0.05), np.float32)
    kw = dict(max_iter=25, method=method, schedule="layered")
    xla = BPDecoder(H, BPConfig(**kw))(syn, prior)
    pal = BPDecoder(H, BPConfig(backend="pallas", batch_tile=128, **kw))(syn, prior)
    assert np.array_equal(np.asarray(xla.converged), np.asarray(pal.converged))
    assert np.array_equal(np.asarray(xla.iterations), np.asarray(pal.iterations))
    assert np.array_equal(np.asarray(xla.hard), np.asarray(pal.hard))


def test_pallas_irregular_check_degrees(rng):
    """Space-time matrices have mixed check degrees (7 and 8): exercises the
    phantom-slot masking in the kernel tables."""
    code = get_code("steane")
    Hst = space_time_matrix(code.Hx, 3)
    syn = sample(rng, Hst, 0.02, batch=128)
    prior = np.full(Hst.shape[1], np.log(0.98 / 0.02), np.float32)
    xla = BPDecoder(Hst, BPConfig(max_iter=20))(syn, prior)
    pal = BPDecoder(Hst, BPConfig(max_iter=20, backend="pallas", batch_tile=128))(
        syn, prior
    )
    assert np.array_equal(np.asarray(xla.converged), np.asarray(pal.converged))
    assert np.array_equal(np.asarray(xla.hard), np.asarray(pal.hard))


def test_pallas_ragged_batch(rng):
    """Batch not a multiple of the tile: padding lanes must not leak."""
    code = get_code("steane")
    H = code.Hx
    syn = sample(rng, H, 0.05, batch=100)
    prior = np.full(7, np.log(0.95 / 0.05), np.float32)
    xla = BPDecoder(H, BPConfig(max_iter=20))(syn, prior)
    pal = BPDecoder(H, BPConfig(max_iter=20, backend="pallas", batch_tile=128))(
        syn, prior
    )
    assert np.asarray(pal.hard).shape == (100, 7)
    assert np.array_equal(np.asarray(xla.converged), np.asarray(pal.converged))
    assert np.array_equal(np.asarray(xla.hard), np.asarray(pal.hard))


def test_pallas_large_irregular_routes_to_dem_kernel(rng):
    """Graphs whose one-hot tables exceed the VMEM budget route to the
    streamed DEM kernel (round 3) — decisions must match the XLA path."""
    code = get_code("[[144, 12, 12]]")
    Hst = space_time_matrix(code.Hx, 12)  # (864, 2592): fused tables ~70 MiB
    syn = sample(rng, Hst, 0.001, batch=16)
    prior = np.full(Hst.shape[1], np.log(0.999 / 0.001), np.float32)
    pal = BPDecoder(Hst, BPConfig(max_iter=5, backend="pallas"))(syn, prior)
    xla = BPDecoder(Hst, BPConfig(max_iter=5))(syn, prior)
    assert np.array_equal(np.asarray(xla.converged), np.asarray(pal.converged))
    assert np.array_equal(np.asarray(xla.hard), np.asarray(pal.hard))


def test_pallas_falls_back_on_unsupported_config(rng):
    """Damping on an irregular graph has no kernel — must warn and use the
    XLA path instead of failing at compile time."""
    import warnings

    code = get_code("[[144, 12, 12]]")
    Hst = space_time_matrix(code.Hx, 12)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dec = BPDecoder(
            Hst, BPConfig(max_iter=5, backend="pallas", damping=0.7)
        )
        assert any("falling back" in str(x.message) for x in w)
    syn = sample(rng, Hst, 0.001, batch=8)
    prior = np.full(Hst.shape[1], np.log(0.999 / 0.001), np.float32)
    res = dec(syn, prior)
    assert np.asarray(res.hard).shape == (8, Hst.shape[1])


def test_pallas_mm_bf16_valid_and_close(rng):
    """bf16-MXU mode: decisions need not bit-match f32 (messages round at
    the matmul boundaries), but convergence detection is EXACT — every
    converged lane's hard decision must reproduce its syndrome — and the
    convergence rate must sit within a few lanes of the f32 kernel."""
    code = get_code("[[72, 12, 6]]")
    H = code.Hx
    syn = sample(rng, H, 0.05, batch=256)
    prior = np.full(code.n, np.log(0.95 / 0.05), np.float32)
    f32 = BPDecoder(
        H, BPConfig(max_iter=25, backend="pallas", batch_tile=128)
    )(syn, prior)
    b16 = BPDecoder(
        H,
        BPConfig(
            max_iter=25, backend="pallas", batch_tile=128,
            mm_dtype="bfloat16",
        ),
    )(syn, prior)
    conv = np.asarray(b16.converged)
    hard = np.asarray(b16.hard)
    resid = (hard @ H.T) % 2
    np.testing.assert_array_equal(resid[conv], np.asarray(syn)[conv])
    assert abs(int(conv.sum()) - int(np.asarray(f32.converged).sum())) <= 8


def test_mm_dtype_config_guards():
    code = get_code("[[72, 12, 6]]")
    with pytest.raises(ValueError, match="mm_dtype"):
        BPConfig(max_iter=10, mm_dtype="bfloat16")  # xla backend
    with pytest.raises(ValueError, match="mm_dtype"):
        BPConfig(
            max_iter=10, backend="pallas", schedule="layered",
            mm_dtype="bfloat16",
        )
