"""Spectral pipeline: Laplacians, PE, batched masked eigh, projectors."""
import numpy as np
import jax.numpy as jnp

from signnet_basisnet_tpu import spectral as sp


def ring(n):
    s = np.arange(n)
    senders = np.concatenate([s, (s + 1) % n])
    receivers = np.concatenate([(s + 1) % n, s])
    return senders, receivers


def test_sym_laplacian_spectrum_bounds():
    s, r = ring(6)
    A = sp.adjacency_dense_np(s, r, 6)
    L = sp.sym_laplacian_np(A)
    vals, vecs = sp.eigh_np(L)
    assert vals[0] == np.float32(0) or abs(vals[0]) < 1e-6
    assert np.all(vals >= -1e-6) and np.all(vals <= 2 + 1e-6)
    # orthonormal
    np.testing.assert_allclose(vecs.T @ vecs, np.eye(6), atol=1e-5)


def test_lap_pe_zero_pad_small_graph():
    # 3-node path, k=8 -> only 2 non-trivial eigvecs, rest zero
    s = np.array([0, 1, 1, 2]); r = np.array([1, 0, 2, 1])
    vals, vecs = sp.lap_pe_np(s, r, 3, k=8)
    assert vecs.shape == (3, 8)
    assert np.all(vecs[:, 2:] == 0) and np.all(vals[2:] == 0)
    assert np.any(vecs[:, 0] != 0)


def test_masked_eigh_matches_numpy_per_graph():
    """Batched device eigh on padded Laplacians == per-graph numpy eigh."""
    rng = np.random.default_rng(0)
    npad = 12
    sizes = [5, 8, 12]
    Ls = np.zeros((3, npad, npad), np.float32)
    mask = np.zeros((3, npad), np.float32)
    refs = []
    for i, n in enumerate(sizes):
        A = (rng.random((n, n)) < 0.4).astype(float)
        A = np.triu(A, 1); A = A + A.T
        L = sp.sym_laplacian_np(A)
        Ls[i, :n, :n] = L
        mask[i, :n] = 1
        refs.append(np.linalg.eigh(L)[0])
    vals, vecs, valid = sp.batched_masked_eigh(jnp.asarray(Ls), jnp.asarray(mask))
    vals = np.asarray(vals); vecs = np.asarray(vecs)
    for i, n in enumerate(sizes):
        np.testing.assert_allclose(vals[i, :n], refs[i], atol=1e-4)
        # padding eigenpairs zeroed
        assert np.all(vals[i, n:] == 0)
        assert np.all(vecs[i, :, n:] == 0)
        assert np.all(vecs[i, n:, :] == 0)
        # eigvecs actually diagonalize: L v = lambda v on the real block
        Lv = Ls[i, :n, :n] @ vecs[i, :n, :n]
        lv = vecs[i, :n, :n] * vals[i, None, :n]
        np.testing.assert_allclose(Lv, lv, atol=1e-3)


def test_rwpe_values():
    s, r = ring(4)
    pe = sp.rwpe_np(s, r, 4, k=3)
    # ring of 4, RW = A/2; diag of RW = 0; RW^2 diagonal = 1/2
    np.testing.assert_allclose(pe[:, 0], 0.0)
    np.testing.assert_allclose(pe[:, 1], 0.5, atol=1e-6)


def test_eigenspace_projectors():
    # 2D grid 3x3 has repeated eigenvalues
    n = 9
    idx = np.arange(n).reshape(3, 3)
    sends, recvs = [], []
    for i in range(3):
        for j in range(3):
            for di, dj in ((0, 1), (1, 0)):
                if i + di < 3 and j + dj < 3:
                    a, b = idx[i, j], idx[i + di, j + dj]
                    sends += [a, b]; recvs += [b, a]
    A = sp.adjacency_dense_np(np.array(sends), np.array(recvs), n)
    L = sp.sym_laplacian_np(A)
    vals, vecs = sp.eigh_np(L)
    layout = sp.eigenspace_layout(vals, decimals=5)
    assert layout.counts.sum() == n
    assert max(layout.uniq_mults) > 1  # grid has degeneracies
    projs = sp.projectors_by_multiplicity(vecs, layout)
    # projectors are idempotent symmetric with trace == multiplicity
    for m, P in projs.items():
        for p in P:
            np.testing.assert_allclose(p, p.T, atol=1e-5)
            np.testing.assert_allclose(p @ p, p, atol=1e-4)
            np.testing.assert_allclose(np.trace(p), m, atol=1e-3)
    # projectors sum to identity over the full spectrum
    total = sum(P.sum(axis=0) for P in projs.values())
    np.testing.assert_allclose(total, np.eye(n), atol=1e-4)


def test_canonical_sign_consistency():
    rng = np.random.default_rng(3)
    V = rng.normal(size=(7, 4)).astype(np.float32)
    flipped = V * np.array([1, -1, 1, -1], np.float32)[None, :]
    a = np.asarray(sp.canonical_sign(jnp.asarray(V)))
    b = np.asarray(sp.canonical_sign(jnp.asarray(flipped)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_basis_rotation_preserves_spectral_content():
    """train_filters --basis_rot_seed re-draws the eigenbasis inside each
    repeated eigenspace: V' must stay orthonormal and reproduce the same
    spectral projector V diag(f(w)) V^T for any filter f."""
    from signnet_basisnet_tpu.train_filters import _rotate_within_eigenspaces

    rng = np.random.default_rng(0)
    # symmetric matrix with REPEATED eigenvalues: block diag of scaled
    # identities conjugated by a random orthogonal
    d = 12
    vals = np.array([0.0] * 3 + [1.0] * 4 + [2.5] * 5)
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    V = Q
    Vr = _rotate_within_eigenspaces(V, vals, rot_seed=7)
    # still orthonormal
    np.testing.assert_allclose(Vr.T @ Vr, np.eye(d), atol=1e-5)
    # same filtered operator for an arbitrary filter of the eigenvalues
    f = np.exp(-vals)
    A = (V * f) @ V.T
    Ar = (Vr * f) @ Vr.T
    np.testing.assert_allclose(Ar, A, atol=1e-5)
    # and it actually changed the basis inside repeated spaces
    assert np.abs(Vr - V.astype(np.float32)).max() > 1e-3
