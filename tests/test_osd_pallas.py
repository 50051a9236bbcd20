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
