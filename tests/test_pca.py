"""PCA invariants (operators/pca.py): the rows-only ``pca_project``
registry query is pinned here by its algebra, since eigendecomposition
has no SQL oracle."""

from __future__ import annotations

import numpy as np
import pytest

from options_data_pipeline_spark.operators.pca import (
    covariance_frame,
    fit_loadings,
    gram_partial,
    project,
)
from options_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def cov_np(spark, emb):
    rows = covariance_frame(emb).collect()
    d = max(r["j"] for r in rows)
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov"]
    return cov


def test_covariance_matches_numpy(spark, emb, cov_np):
    m = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    expected = np.cov(m, rowvar=False, bias=True)  # population covariance
    assert np.allclose(cov_np, expected, atol=1e-6)


def test_gram_partial_matches_exact_path(spark, emb, cov_np):
    s2, s1, n = gram_partial(emb)
    cov_from_gram = s2 / n - np.outer(s1 / n, s1 / n)
    assert n == emb.count()
    assert np.allclose(cov_from_gram, cov_np, atol=1e-6)


def test_loadings_orthonormal_and_ordered(spark, emb):
    loadings, eigvals = fit_loadings(emb, n_components=3)
    # unit norm + mutual orthogonality (9-dp rounded loadings)
    gram = loadings @ loadings.T
    assert np.allclose(gram, np.eye(3), atol=1e-6)
    # descending explained variance, all non-negative for a covariance
    assert eigvals[0] >= eigvals[1] >= eigvals[2] >= -1e-12
    # sign convention: the largest-|coordinate| of each component is positive
    for w in loadings:
        assert w[int(np.argmax(np.abs(w)))] > 0


def test_projection_variance_matches_eigenvalues(spark, emb):
    loadings, eigvals = fit_loadings(emb, n_components=2)
    m = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    means = m.mean(axis=0)
    out = project(emb, loadings, means.tolist()).select("pc1", "pc2").collect()
    pcs = np.array([[r["pc1"], r["pc2"]] for r in out])
    # population variance of each projected axis equals its eigenvalue
    # (6-dp projection rounding bounds the drift)
    got = pcs.var(axis=0)
    assert np.allclose(got, eigvals, rtol=1e-4, atol=1e-5)


def test_registry_query_runs_and_is_stable(spark):
    """pca_project: same output on repeated runs (determinism contract
    the driver's rows-only check relies on)."""
    from options_data_pipeline_spark.plans.vectors import q_pca_project

    a = q_pca_project(spark, SF_DIR).collect()
    b = q_pca_project(spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_reconstruction_error_matches_residual_spectrum(spark, emb):
    """VERDICT r13 #7: a second independent axis for the one no-oracle
    registry row.  PCA optimality identity: the mean squared
    reconstruction error of the REGISTRY QUERY's own (pc1, pc2) output
    equals the residual spectrum trace(cov) − λ1 − λ2 — ties the
    golden-hashed projection to the eigendecomposition through an
    algebraic law neither pin shares with the other."""
    import numpy as np

    from options_data_pipeline_spark.operators.pca import fit_loadings
    from options_data_pipeline_spark.plans.vectors import q_pca_project

    loadings, eigvals = fit_loadings(emb, n_components=2)
    m = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    means = m.mean(axis=0)
    out = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in q_pca_project(spark, SF_DIR).collect()
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    pcs = np.array([out[i] for i in ids])
    recon = means + pcs @ loadings
    mse = float(np.mean(np.sum((m - recon) ** 2, axis=1)))
    cov = np.cov(m, rowvar=False, bias=True)
    residual = float(np.trace(cov) - eigvals[0] - eigvals[1])
    assert np.isclose(mse, residual, rtol=1e-4, atol=1e-6), (mse, residual)
