"""VMEM-resident transform elimination kernel vs the XLA transform path.

Contract: bit-identical (T, b, rank, piv_col) and therefore identical OSD
solutions on wide systems (interpret mode on CPU)."""

import numpy as np
import pytest

from qldpc_tpu.codes import get_code
from qldpc_tpu.decoders import BPConfig, BPDecoder
from qldpc_tpu.decoders.osd import OSDConfig, OSDDecoder


def _wide_system(rng):
    """A Steane circuit DEM: wide enough to trigger the transform path."""
    from qldpc_tpu.noise.circuit import memory_experiment_dem

    dem = memory_experiment_dem(get_code("steane"), p=0.01, rounds=3)
    assert dem.H.shape[1] > 4 * 32 * ((dem.H.shape[0] + 31) // 32)
    return dem


def _bp_inputs(rng, dem, batch):
    import jax.numpy as jnp

    mech = (rng.random((batch, dem.H.shape[1])) < dem.priors[None, :]).astype(
        np.int8
    )
    syn = (mech @ dem.H.T) % 2
    bp = BPDecoder(dem.H, BPConfig(max_iter=8))
    res = bp(jnp.asarray(syn), jnp.asarray(dem.llrs, jnp.float32))
    return syn, res


@pytest.mark.parametrize("batch", [64, 128])
def test_transform_kernel_matches_xla_transform(rng, batch):
    import jax.numpy as jnp

    dem = _wide_system(rng)
    syn, res = _bp_inputs(rng, dem, batch)

    xla = OSDDecoder(dem.H, OSDConfig(order=0, backend="lanes"))
    pal = OSDDecoder(dem.H, OSDConfig(order=0, backend="pallas"))
    assert xla._use_transform and pal._use_transform

    order = jnp.argsort(jnp.abs(res.llrs), axis=1, stable=True)
    b = jnp.asarray(syn.T, jnp.uint32)
    Tx, bx, rx, px = xla._eliminate_lanes_T(order, b)
    Tp, bp_, rp, pp = pal._eliminate_lanes_T_pallas(order, b)
    assert np.array_equal(np.asarray(rx), np.asarray(rp))
    assert np.array_equal(np.asarray(px), np.asarray(pp))
    assert np.array_equal(np.asarray(bx), np.asarray(bp_))
    assert np.array_equal(np.asarray(Tx), np.asarray(Tp))


@pytest.mark.parametrize("order_w", [0, 4])
def test_osd_solutions_match_on_wide_system(rng, order_w):
    dem = _wide_system(rng)
    syn, res = _bp_inputs(rng, dem, 96)
    sol_x = OSDDecoder(dem.H, OSDConfig(order=order_w, backend="lanes"))(
        syn, res.llrs, res.hard
    )
    sol_p = OSDDecoder(dem.H, OSDConfig(order=order_w, backend="pallas"))(
        syn, res.llrs, res.hard
    )
    assert np.array_equal(np.asarray(sol_x), np.asarray(sol_p))
    # syndrome validity of the solutions (consistent systems)
    s_hat = (np.asarray(sol_p) @ dem.H.T) % 2
    consistent = (s_hat == syn).all(axis=1)
    assert consistent.mean() > 0.9


@pytest.mark.parametrize("backend", ["lanes", "pallas"])
def test_b_exit_shortcut_is_exact(rng, backend):
    """OSD-0's unresolved-b early exit must give the same solution as the
    full rank(H) sweep (every post-exit pivot carries b = 0)."""
    import jax.numpy as jnp

    dem = _wide_system(rng)
    syn, res = _bp_inputs(rng, dem, 96)
    dec = OSDDecoder(dem.H, OSDConfig(order=0, backend=backend))
    order = jnp.argsort(jnp.abs(res.llrs), axis=1, stable=True)
    b = jnp.asarray(np.asarray(syn).T, np.uint32)
    run = (
        dec._eliminate_lanes_T_pallas
        if backend == "pallas"
        else dec._eliminate_lanes_T
    )
    _, b_full, _, piv_full = run(order, b, b_exit=False)
    _, b_fast, _, piv_fast = run(order, b, b_exit=True)
    # the (piv, b) pairs that scatter corrections must agree exactly:
    # rows present only in the full sweep must carry b == 0
    bf, pf = np.asarray(b_full), np.asarray(piv_full)
    bq, pq = np.asarray(b_fast), np.asarray(piv_fast)
    for lane in range(bf.shape[1]):
        full = {(c, v) for c, v in zip(pf[:, lane], bf[:, lane]) if c >= 0 and v}
        fast = {(c, v) for c, v in zip(pq[:, lane], bq[:, lane]) if c >= 0 and v}
        assert full == fast, f"lane {lane}"


def test_dem_engine_sparse_syndrome_matches_matmul(rng):
    from qldpc_tpu.mc import DEMEngine, DEMEngineConfig

    dem = _wide_system(rng)
    eng = DEMEngine(dem, DEMEngineConfig(batch_size=32, bp=BPConfig(max_iter=5)))
    errors = (rng.random((32, dem.H.shape[1])) < 0.01).astype(np.int8)
    import jax.numpy as jnp

    got = np.asarray(eng._syndrome(jnp.asarray(errors)))
    assert np.array_equal(got, (errors @ dem.H.T) % 2)
