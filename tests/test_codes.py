import numpy as np
import pytest

from qldpc_tpu.codes import CSSCode, get_code, gf2, ALL_CODE_NAMES, BB_CODE_NAMES

REF_CODES = "/root/reference/codes"


class TestGF2:
    def test_row_reduce_identity(self):
        R, piv = gf2.row_reduce(np.eye(4, dtype=int))
        assert piv == [0, 1, 2, 3]
        assert np.array_equal(R, np.eye(4, dtype=np.uint8))

    def test_rank_and_nullspace(self, rng):
        M = rng.integers(0, 2, size=(20, 37), dtype=np.uint8)
        r = gf2.rank(M)
        ns = gf2.null_space(M)
        assert ns.shape == (37 - r, 37)
        assert not ((M @ ns.T) % 2).any()
        assert gf2.rank(ns) == ns.shape[0]

    def test_solve_consistent(self, rng):
        M = rng.integers(0, 2, size=(15, 30), dtype=np.uint8)
        x_true = rng.integers(0, 2, size=30, dtype=np.uint8)
        b = (M @ x_true) % 2
        x = gf2.solve(M, b)
        assert x is not None
        assert np.array_equal((M @ x) % 2, b)

    def test_solve_inconsistent(self):
        M = np.array([[1, 0], [1, 0]], dtype=np.uint8)
        assert gf2.solve(M, np.array([1, 0])) is None

    def test_in_row_space(self, rng):
        M = rng.integers(0, 2, size=(5, 12), dtype=np.uint8)
        combo = M[[0, 2, 4]].sum(axis=0) % 2
        assert gf2.in_row_space(M, combo)


class TestBBCodes:
    @pytest.mark.parametrize("name", BB_CODE_NAMES)
    def test_matches_reference_matrices(self, name):
        """Our from-scratch BB construction is bit-exact vs the reference npz."""
        code = get_code(name)
        ref = np.load(f"{REF_CODES}/{name}.npz")
        assert np.array_equal(code.Hx, ref["Hx"] % 2)
        assert np.array_equal(code.Hz, ref["Hz"] % 2)
        assert code.distance == int(ref["distance"])

    @pytest.mark.parametrize("name", ALL_CODE_NAMES)
    def test_logical_operator_invariants(self, name):
        code = get_code(name)
        k = code.k
        assert code.Lx.shape == (k, code.n)
        assert code.Lz.shape == (k, code.n)
        # commutation with stabilizers
        assert not ((code.Hz @ code.Lx.T) % 2).any()
        assert not ((code.Hx @ code.Lz.T) % 2).any()
        # symplectic pairing is the identity
        assert np.array_equal((code.Lx @ code.Lz.T) % 2, np.eye(k, dtype=np.uint8))

    def test_bb_row_col_weights(self):
        code = get_code("[[144, 12, 12]]")
        assert set(code.Hx.sum(axis=1)) == {6}
        assert set(code.Hx.sum(axis=0)) == {3}

    def test_params(self):
        assert get_code("[[144, 12, 12]]").params == (144, 12, 12)
        assert get_code("steane").params == (7, 1, 3)

    def test_npz_roundtrip(self, tmp_path):
        code = get_code("[[72, 12, 6]]")
        path = tmp_path / "code.npz"
        code.save(path)
        back = CSSCode.load(path, name=code.name)
        assert np.array_equal(back.Hx, code.Hx)
        assert np.array_equal(back.Lz, code.Lz)
        assert back.distance == code.distance

    def test_load_reference_steane_without_logicals(self):
        back = CSSCode.load(f"{REF_CODES}/steane.npz")
        assert back.Hx.shape == (3, 7)
        assert back.Lx.shape == (0, 7)

    def test_css_condition_enforced(self):
        with pytest.raises(ValueError):
            CSSCode(
                name="bad",
                Hx=np.array([[1, 1, 0]]),
                Hz=np.array([[1, 0, 0]]),
                Lx=np.zeros((0, 3)),
                Lz=np.zeros((0, 3)),
            )
