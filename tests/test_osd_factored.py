"""Factored (T-free) elimination vs the transform paths — solution parity.

The factored backend (ops/osd_factored.py) uses implicit pivoting (no row
swaps), so its internal T/b row assignment differs from
decoders/osd.py::_eliminate_lanes_T — but the pivot COLUMN set and the
reduced syndrome value at each pivot column are canonical (the RREF of
[H_perm | b] is unique), so OSD-0 *solutions* must match bit-for-bit, for
consistent and inconsistent syndromes alike.
"""

import numpy as np
import pytest

from qldpc_tpu.decoders.osd import OSDConfig, OSDDecoder
from qldpc_tpu.ops.osd_factored import FactoredEliminator


@pytest.fixture
def rng():
    return np.random.default_rng(20260820)


def _wide_case(rng, m=40, n=640, batch=6, density=0.05, err=0.02,
               redundant=3):
    H = (rng.random((m - redundant, n)) < density).astype(np.uint8)
    H[:, : m - redundant] |= np.eye(m - redundant, dtype=np.uint8)
    H = np.vstack([H, H[:redundant]])  # rank < m
    errors = (rng.random((batch, n)) < err).astype(np.int8)
    syndromes = (errors @ H.T) % 2
    llrs = rng.normal(size=(batch, n)).astype(np.float32) * 3.0
    hard = np.zeros((batch, n), np.int8)
    return H, syndromes.astype(np.int8), llrs, hard


def test_eliminator_matches_numpy_rref(rng):
    """Direct unit check of b/pivot-columns against a dense numpy RREF."""
    H, syndromes, llrs, hard = _wide_case(rng, batch=3)
    m, n = H.shape
    from qldpc_tpu import native

    elim = FactoredEliminator(
        H, h_rank=int(native.rank(H)), max_cols=n, interpret=True
    )
    order = np.argsort(np.abs(llrs), axis=1, kind="stable").astype(np.int32)
    b, piv, piv_col, overflow = map(
        np.asarray, elim(order, syndromes.T.astype(np.uint32))
    )
    assert not overflow.any()
    for i in range(len(syndromes)):
        # dense RREF over the same column order
        A = H[:, order[i]].astype(np.uint8)
        bb = syndromes[i].astype(np.uint8).copy()
        rank = 0
        rowcol = {}
        for col in range(n):
            cand = np.nonzero(A[rank:, col])[0]
            if cand.size == 0:
                continue
            p = rank + cand[0]
            A[[rank, p]] = A[[p, rank]]
            bb[[rank, p]] = bb[[p, rank]]
            el = np.nonzero(A[:, col])[0]
            el = el[el != rank]
            A[el] ^= A[rank]
            bb[el] ^= bb[rank]
            rowcol[rank] = int(order[i][col])
            rank += 1
        # b is canonical only AFTER the full RREF (later pivots eliminate
        # above and keep changing earlier rows' b)
        pivots = {c: int(bb[r]) for r, c in rowcol.items()}
        got = {
            int(piv_col[r, i]): int(b[r, i])
            for r in range(m)
            if piv_col[r, i] >= 0
        }
        # the factored run may stop early (b-exit): every pivot it reports
        # must carry the canonical value, and the nonzero support must match
        for c, v in got.items():
            assert pivots[c] == v, f"sample {i} col {c}"
        exp_nz = {c for c, v in pivots.items() if v}
        got_nz = {c for c, v in got.items() if v}
        assert exp_nz == got_nz, f"sample {i}"


@pytest.mark.parametrize("inconsistent", [False, True])
def test_osd0_solutions_match_transform_path(rng, inconsistent):
    H, syndromes, llrs, hard = _wide_case(rng, batch=8)
    if inconsistent:
        syndromes = np.asarray(syndromes).copy()
        flip = rng.integers(0, H.shape[0], size=len(syndromes))
        syndromes[np.arange(len(syndromes)), flip] ^= 1
    dec_f = OSDDecoder(H, OSDConfig(order=0, backend="factored"))
    dec_t = OSDDecoder(H, OSDConfig(order=0, backend="lanes"))
    a = np.asarray(dec_f(syndromes, llrs, hard))
    b = np.asarray(dec_t(syndromes, llrs, hard))
    assert np.array_equal(a, b)


def test_osd0_solutions_with_nonzero_hard(rng):
    H, syndromes, llrs, hard = _wide_case(rng, batch=8)
    hard = (rng.random(hard.shape) < 0.03).astype(np.int8)
    dec_f = OSDDecoder(H, OSDConfig(order=0, backend="factored"))
    dec_t = OSDDecoder(H, OSDConfig(order=0, backend="lanes"))
    assert np.array_equal(
        np.asarray(dec_f(syndromes, llrs, hard)),
        np.asarray(dec_t(syndromes, llrs, hard)),
    )


def test_factored_rejects_osde():
    H = np.zeros((8, 600), np.uint8)
    H[np.arange(8), np.arange(8)] = 1
    with pytest.raises(ValueError):
        OSDDecoder(H, OSDConfig(order=2, backend="factored"))
