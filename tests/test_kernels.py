"""Numpy-kernel unit tests — the reference-parity layer (SURVEY.md §5.2-1).

Mirrors what the reference's own lasso/omp/llc unit tests assert:
reconstruction error and code sparsity, plus paper-defined invariants
(exact recovery, KKT conditions, closed-form equivalence, monotone K-SVD).
"""

import itertools

import numpy as np
import pytest

from lyssandra_spark.functions import kernels as K

RNG = np.random.default_rng(42)
DIM, ATOMS = 64, 128


def planted(n=50, k=5, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    D = K.normalize_cols(rng.standard_normal((DIM, ATOMS)))
    Z = np.zeros((ATOMS, n))
    for s in range(n):
        sup = rng.choice(ATOMS, size=k, replace=False)
        Z[sup, s] = rng.standard_normal(k) + np.sign(rng.standard_normal(k))
    X = D @ Z
    if noise:
        X = X + noise * rng.standard_normal(X.shape)
    return D, X, Z


class TestOMP:
    def test_exact_recovery(self):
        D, X, Ztrue = planted(n=40, k=5, seed=1)
        Z = K.omp(D, X, k=5)
        assert np.allclose(Z, Ztrue, rtol=1e-6, atol=1e-8)
        assert (K.sparsity(Z) <= 5).all()
        assert (K.recon_error(D, X, Z) < 1e-8).all()

    def test_batch_omp_equals_omp(self):
        D, X, _ = planted(n=60, k=5, noise=1e-3, seed=2)
        Z1 = K.omp(D, X, k=5)
        Z2 = K.batch_omp(D, X, k=5)
        assert np.allclose(Z1, Z2, rtol=1e-6, atol=1e-8)

    def test_batch_omp_equals_omp_with_tol(self):
        D, X, _ = planted(n=30, k=8, noise=1e-2, seed=3)
        tol = 0.05
        Z1 = K.omp(D, X, k=8, tol=tol)
        Z2 = K.batch_omp(D, X, k=8, tol=tol)
        assert np.allclose(Z1, Z2, rtol=1e-5, atol=1e-7)

    def test_residual_orthogonal_to_support(self):
        D, X, _ = planted(n=20, k=5, noise=1e-2, seed=4)
        Z = K.batch_omp(D, X, k=5)
        R = X - D @ Z
        for s in range(X.shape[1]):
            sup = np.nonzero(Z[:, s])[0]
            assert np.allclose(D[:, sup].T @ R[:, s], 0.0, atol=1e-8)

    def test_batch_boundary_invariance(self):
        """Encoding is invariant to how samples are split into batches."""
        D, X, _ = planted(n=37, k=5, noise=1e-3, seed=5)
        whole = K.batch_omp(D, X, k=5)
        parts = np.concatenate(
            [K.batch_omp(D, X[:, i : i + 7], k=5) for i in range(0, 37, 7)], axis=1
        )
        # not bit-identical: BLAS GEMM blocks differently per batch shape
        # (low-bit float drift); the parity gate is allclose rtol=1e-6.
        assert np.allclose(whole, parts, rtol=1e-9, atol=1e-11)
        # supports must be IDENTICAL (atom selection robust to the drift)
        assert np.array_equal(whole != 0, parts != 0)

    def test_precomputed_gram_identical(self):
        D, X, _ = planted(n=15, k=5, seed=6)
        G = D.T @ D
        assert np.array_equal(K.batch_omp(D, X, 5), K.batch_omp(D, X, 5, G=G))

    def test_zero_signal(self):
        D, _, _ = planted(n=1, seed=7)
        Z = K.batch_omp(D, np.zeros((DIM, 3)), k=5)
        assert Z.shape == (ATOMS, 3) and (Z == 0).all()

    def test_empty_batch(self):
        D, _, _ = planted(n=1, seed=8)
        assert K.batch_omp(D, np.zeros((DIM, 0)), k=5).shape == (ATOMS, 0)


class TestFISTA:
    @pytest.mark.parametrize("lam", [0.01, 0.1])
    def test_kkt_conditions(self, lam):
        rng = np.random.default_rng(10)
        D = K.normalize_cols(rng.standard_normal((16, 32)))
        X = rng.standard_normal((16, 8))
        Z = K.fista_lasso(D, X, lam=lam, n_iter=5000, tol=1e-14)
        g = D.T @ (X - D @ Z)  # negative gradient of smooth part
        tol = 1e-5
        # off-support: |D^T r| <= lam; on-support: D^T r == lam * sign(z)
        for s in range(X.shape[1]):
            on = np.abs(Z[:, s]) > 1e-10
            assert (np.abs(g[~on, s]) <= lam + tol).all()
            assert np.allclose(g[on, s], lam * np.sign(Z[on, s]), atol=tol)

    def test_objective_decreases_overall(self):
        rng = np.random.default_rng(11)
        D = K.normalize_cols(rng.standard_normal((16, 32)))
        X = rng.standard_normal((16, 5))

        def obj(Z):
            return 0.5 * np.sum((X - D @ Z) ** 2) + 0.1 * np.abs(Z).sum()

        objs = [obj(K.fista_lasso(D, X, 0.1, n_iter=n, tol=0)) for n in (1, 10, 100, 1000)]
        assert all(b <= a + 1e-9 for a, b in itertools.pairwise(objs))

    def test_sparsity_increases_with_lambda(self):
        D, X, _ = planted(n=20, k=5, noise=0.01, seed=12)
        nnz_small = K.sparsity(K.fista_lasso(D, X, 0.01, 2000), tol=1e-8).mean()
        nnz_big = K.sparsity(K.fista_lasso(D, X, 0.5, 2000), tol=1e-8).mean()
        assert nnz_big < nnz_small

    @pytest.mark.parametrize("lam,n_iter,tol", [
        (0.1, 100, 1e-7),   # the bench config
        (0.1, 500, 1e-10),  # the sparse_code default
        (0.05, 300, 0.0),   # tol=0: full fixed-iteration run
    ])
    def test_fista_fused_matches_textbook(self, lam, n_iter, tol):
        """The r10 fused in-place _fista_block must be BIT-identical to the
        textbook allocate-per-op loop it replaced (same op order, same
        operands, same x/L division — only buffer reuse changed)."""
        D, X, _ = planted(n=600, k=5, noise=0.05, seed=13)
        G = D.T @ D
        L = max(float(np.linalg.eigvalsh(G)[-1]), 1e-13)

        def textbook_block(Xb):
            m = D.shape[1]
            n = Xb.shape[1]
            DtX = D.T @ Xb
            Z = np.zeros((m, n))
            Y = Z.copy()
            t = 1.0
            for _ in range(n_iter):
                Znew = K._soft(Y - (G @ Y - DtX) / L, lam / L)
                tnew = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t * t))
                Y = Znew + ((t - 1.0) / tnew) * (Znew - Z)
                delta = float(np.max(np.abs(Znew - Z))) if Z.size else 0.0
                Z = Znew
                t = tnew
                if delta <= tol:
                    break
            return Z

        ref = np.concatenate(
            [textbook_block(X[:, i : i + 256]) for i in range(0, X.shape[1], 256)],
            axis=1,
        )
        got = K.fista_lasso(D, X, lam=lam, n_iter=n_iter, tol=tol, block=256)
        assert np.array_equal(ref, got)


class TestLLC:
    def test_closed_form_vs_brute_force(self):
        rng = np.random.default_rng(20)
        d, m, knn, beta = 8, 16, 3, 1e-4
        D = K.normalize_cols(rng.standard_normal((d, m)))
        X = rng.standard_normal((d, 6))
        Z = K.llc(D, X, knn=knn, beta=beta)
        for s in range(X.shape[1]):
            x = X[:, s]
            d2 = np.sum((D - x[:, None]) ** 2, axis=0)
            nn = np.argsort(d2, kind="stable")[:knn]
            B = D[:, nn]
            shift = B - x[:, None]
            C = shift.T @ shift
            C = C + beta * max(np.trace(C), 1e-13) * np.eye(knn)
            w = np.linalg.solve(C, np.ones(knn))
            w /= w.sum()
            ref = np.zeros(m)
            ref[nn] = w
            assert np.allclose(Z[:, s], ref, rtol=1e-8, atol=1e-10)

    def test_sum_to_one_and_sparsity(self):
        D, X, _ = planted(n=30, seed=21)
        Z = K.llc(D, X, knn=5)
        assert np.allclose(Z.sum(axis=0), 1.0, atol=1e-8)
        assert (K.sparsity(Z) <= 5).all()

    def test_llc_knn_matches_stable_argsort(self):
        """The r10 repeated-masked-argmin knn selection must pick the SAME
        atoms in the SAME order as the stable ascending argsort it replaced
        — including on exact distance ties (both resolve to the lowest
        atom index)."""
        rng = np.random.default_rng(22)
        D = K.normalize_cols(rng.standard_normal((16, 64)))
        X = rng.standard_normal((16, 300))
        d2 = np.sum(D * D, axis=0)[:, None] - 2.0 * (D.T @ X)
        ref = np.argsort(d2, axis=0, kind="stable")[:5]
        assert np.array_equal(ref, K._llc_knn(D, X, 5))
        # planted exact ties: duplicated atoms => duplicated distances
        Dt = D.copy()
        Dt[:, 1] = Dt[:, 40]
        Dt[:, 7] = Dt[:, 40]
        d2t = np.sum(Dt * Dt, axis=0)[:, None] - 2.0 * (Dt.T @ X)
        reft = np.argsort(d2t, axis=0, kind="stable")[:5]
        assert np.array_equal(reft, K._llc_knn(Dt, X, 5))

    def test_llc_sparse_matches_dense(self):
        """llc_sparse (CSR encode path) must scatter to exactly the dense
        llc codes, and its GEMM-free residual (sum_t w_t * shift_t, exact
        because sum w = 1) must match ||x - D z|| to fp rounding."""
        D, X, _ = planted(n=600, k=5, noise=0.05, seed=23)
        Z = K.llc(D, X, knn=5)
        order, w, err = K.llc_sparse(D, X, knn=5)
        n = X.shape[1]
        Zs = np.zeros_like(Z)
        cols = np.arange(n)
        for t in range(5):
            Zs[order[t], cols] = w[:, t]
        assert np.array_equal(Z, Zs)
        assert np.allclose(err, K.recon_error(D, X, Z), rtol=1e-9, atol=1e-12)


class TestDictLearning:
    def test_ksvd_error_nonincreasing(self):
        D0, X, _ = planted(n=200, k=5, noise=0.05, seed=30)
        D = K.init_dict(X, ATOMS, seed=30)
        errs = []
        for _ in range(5):
            Z = K.batch_omp(D, X, k=5)
            errs.append(float(np.linalg.norm(X - D @ Z)))
            D, Z = K.ksvd_update(D, X, Z)
            errs.append(float(np.linalg.norm(X - D @ Z)))
            D = K.replace_dead_atoms(D, X, Z, seed=30)
        # each ksvd sweep must not increase error given fixed codes
        for i in range(0, len(errs) - 1, 2):
            assert errs[i + 1] <= errs[i] + 1e-9
        assert errs[-1] < errs[0]

    def test_ksvd_atoms_stay_normalized(self):
        _, X, _ = planted(n=100, k=5, noise=0.05, seed=31)
        D = K.init_dict(X, ATOMS, seed=31)
        Z = K.batch_omp(D, X, k=5)
        D2, _ = K.ksvd_update(D, X, Z)
        nrm = np.linalg.norm(D2, axis=0)
        assert np.allclose(nrm[nrm > 1e-9], 1.0, atol=1e-10)

    def test_ksvd_deterministic(self):
        _, X, _ = planted(n=80, k=5, noise=0.05, seed=32)
        D = K.init_dict(X, ATOMS, seed=32)
        Z = K.batch_omp(D, X, k=5)
        D1, Z1 = K.ksvd_update(D, X, Z)
        D2, Z2 = K.ksvd_update(D, X, Z)
        assert np.array_equal(D1, D2) and np.array_equal(Z1, Z2)

    def test_odl_stats_additive(self):
        """Partial sufficient statistics sum to the global ones (the
        property that makes the distributed aggregation correct)."""
        D, X, _ = planted(n=64, k=5, noise=0.02, seed=33)
        Z = K.batch_omp(D, X, k=5)
        A_all, B_all = K.odl_accumulate(X, Z)
        A_sum = np.zeros_like(A_all)
        B_sum = np.zeros_like(B_all)
        for i in range(0, 64, 9):
            a, b = K.odl_accumulate(X[:, i : i + 9], Z[:, i : i + 9])
            A_sum += a
            B_sum += b
        assert np.allclose(A_all, A_sum, rtol=1e-12, atol=1e-9)
        assert np.allclose(B_all, B_sum, rtol=1e-12, atol=1e-9)

    def test_odl_update_improves_fit(self):
        _, X, _ = planted(n=150, k=5, noise=0.05, seed=34)
        D = K.init_dict(X, ATOMS, seed=99)  # mismatched init
        Z = K.batch_omp(D, X, k=5)
        A, B = K.odl_accumulate(X, Z)
        D2 = K.odl_update_dict(D, A, B, n_iter=3)
        # with codes fixed, dictionary update must reduce ||X - D Z||_F
        assert np.linalg.norm(X - D2 @ Z) <= np.linalg.norm(X - D @ Z) + 1e-9

    def test_init_dict_deterministic_and_normalized(self):
        _, X, _ = planted(n=50, seed=35)
        D1 = K.init_dict(X, ATOMS, seed=5)
        D2 = K.init_dict(X, ATOMS, seed=5)
        assert np.array_equal(D1, D2)
        assert np.allclose(np.linalg.norm(D1, axis=0), 1.0, atol=1e-10)


def test_batch_omp_block_invariance_support_and_values():
    """The docstring contract pinned precisely: across block sizes the
    selected SUPPORT is identical and coefficient values agree to ~1e-12
    (BLAS takes shape-dependent GEMM paths, so bit-equality is NOT
    promised — see kernels.batch_omp docstring)."""
    import numpy as np

    from lyssandra_spark.functions import kernels as K

    rng = np.random.default_rng(55)
    D = K.init_dict(rng.standard_normal((64, 400)), 128, seed=3)
    X = rng.standard_normal((64, 700))
    ref = K.batch_omp(D, X, k=5, block=10**9)
    for blk in (16, 100, 256, 699, 700):
        got = K.batch_omp(D, X, k=5, block=blk)
        assert np.array_equal(got != 0, ref != 0), f"support differs at {blk}"
        assert np.max(np.abs(got - ref)) < 1e-12, blk
