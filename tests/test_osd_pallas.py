"""Pallas OSD elimination kernel vs the XLA lanes path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from qldpc_tpu.codes import get_code
from qldpc_tpu.decoders.osd import OSDConfig, OSDDecoder
from qldpc_tpu.ops.osd_pallas import eliminate_pallas


def test_matches_xla_lanes(rng):
    code = get_code("[[72, 12, 6]]")
    H = code.Hx
    n = code.n
    B = 128
    osd = OSDDecoder(H, OSDConfig(order=0))

    errors = (rng.random((B, n)) < 0.08).astype(np.uint8)
    resid = (errors @ H.T) % 2
    # per-sample column permutations like the real pipeline
    orders = np.stack([rng.permutation(n) for _ in range(B)])
    Hp = np.stack([H[:, o] for o in orders])

    A = osd._pack_lanes(jnp.asarray(Hp))
    b = jnp.asarray(resid.T, jnp.uint32)

    A1, b1, _rank1, piv1 = osd._eliminate_lanes(A, b)
    A2, b2, piv2 = eliminate_pallas(A, b, n=n, batch_tile=128, interpret=True)

    assert np.array_equal(np.asarray(A1), np.asarray(A2))
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert np.array_equal(np.asarray(piv1), np.asarray(piv2))


def test_solves_systems(rng):
    """Pivot back-substitution from the kernel's RREF solves H_p e = resid."""
    code = get_code("steane")
    H = code.Hx
    n = code.n
    B = 128
    osd = OSDDecoder(H, OSDConfig(order=0))
    errors = (rng.random((B, n)) < 0.2).astype(np.uint8)
    resid = (errors @ H.T) % 2
    Hp = np.broadcast_to(H, (B, *H.shape))
    A = osd._pack_lanes(jnp.asarray(Hp))
    b = jnp.asarray(resid.T, jnp.uint32)
    _, b2, piv2 = eliminate_pallas(A, b, n=n, batch_tile=128, interpret=True)
    b_bt = np.asarray(b2).T
    piv_bt = np.asarray(piv2).T
    for i in range(B):
        e = np.zeros(n, np.uint8)
        for r in range(H.shape[0]):
            if piv_bt[i, r] >= 0:
                e[piv_bt[i, r]] = b_bt[i, r]
        assert np.array_equal((H @ e) % 2, resid[i]), f"sample {i}"


def test_backend_pallas_matches_lanes_osd0(rng):
    """OSDConfig(backend='pallas') is bit-identical to the lanes backend,
    including ragged batches that need lane padding."""
    code = get_code("[[72, 12, 6]]")
    H = code.Hx
    B = 100  # not a multiple of batch_tile -> exercises padding
    errors = (rng.random((B, code.n)) < 0.08).astype(np.uint8)
    syn = jnp.asarray((errors @ H.T) % 2)
    llrs = jnp.asarray(rng.normal(size=(B, code.n)), jnp.float32)
    hard = jnp.asarray((rng.random((B, code.n)) < 0.05).astype(np.int8))
    sol_l = OSDDecoder(H, OSDConfig(order=0))(syn, llrs, hard)
    sol_p = OSDDecoder(H, OSDConfig(order=0, backend="pallas", batch_tile=64))(
        syn, llrs, hard
    )
    assert np.array_equal(np.asarray(sol_l), np.asarray(sol_p))


def test_backend_pallas_matches_lanes_osde(rng):
    code = get_code("steane")
    H = code.Hx
    B = 48
    errors = (rng.random((B, code.n)) < 0.15).astype(np.uint8)
    syn = (errors @ H.T) % 2
    # flip some syndrome bits so a few systems go inconsistent and the
    # pattern search actually runs
    syn[: B // 4] ^= 1
    syn = jnp.asarray(syn)
    llrs = jnp.asarray(rng.normal(size=(B, code.n)), jnp.float32)
    hard = jnp.asarray(np.zeros((B, code.n), np.int8))
    sol_l = OSDDecoder(H, OSDConfig(order=2))(syn, llrs, hard)
    sol_p = OSDDecoder(H, OSDConfig(order=2, backend="pallas", batch_tile=16))(
        syn, llrs, hard
    )
    assert np.array_equal(np.asarray(sol_l), np.asarray(sol_p))
