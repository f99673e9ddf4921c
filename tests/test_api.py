"""sklearn-style API smoke tests (reference assoc/smoke.py analog)."""

import numpy as np
import pytest

from janusx_tpu.api import ASSOC, GenomicSelection


@pytest.fixture(scope="module")
def api_problem():
    rng = np.random.default_rng(3)
    n, m = 120, 60
    G = rng.binomial(2, 0.3, size=(n, m)).astype(float)
    y = G[:, 5] * 0.9 + rng.normal(size=n)
    Gc = G - G.mean(0)
    K = Gc @ Gc.T / m
    return G, y, K


@pytest.mark.parametrize("model", ["lm", "lmm", "fvlmm", "splmm"])
def test_assoc_routes(api_problem, model):
    G, y, K = api_problem
    a = ASSOC(model).fit(y, K=K)
    df = a.assoc(G)
    assert df.shape == (G.shape[1], 3)
    assert set(df.columns) == {"beta", "se", "pwald"}
    assert df["pwald"].idxmin() == 5
    if model != "lm":
        assert a.null_fit_ is not None and a.null_fit_["lambda"] > 0


def test_assoc_missing_pheno(api_problem):
    G, y, K = api_problem
    y2 = y.copy()
    y2[:10] = np.nan
    df = ASSOC("lmm").fit(y2, K=K).assoc(G)
    assert df.shape == (G.shape[1], 3)
    assert np.isfinite(df["pwald"]).all()


def test_assoc_chunked_equals_unchunked(api_problem):
    G, y, K = api_problem
    a = ASSOC("lmm").fit(y, K=K)
    d1 = a.assoc(G, chunk=7)
    d2 = a.assoc(G, chunk=4096)
    # chunking changes matmul tiling -> f32 lattice noise can move lambda*
    # within the scan tolerance on flat surfaces; compare to that tolerance
    np.testing.assert_allclose(d1["beta"], d2["beta"], rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(
        -np.log10(d1["pwald"]), -np.log10(d2["pwald"]), atol=2e-2
    )


def test_gs_api():
    # polygenic trait (kernel methods need distributed signal)
    rng = np.random.default_rng(9)
    n, m = 160, 120
    G = rng.binomial(2, 0.35, size=(n, m)).astype(float)
    gv = (G - G.mean(0)) @ rng.normal(size=m) * 0.2
    y = gv + rng.normal(size=n) * np.std(gv) * 0.7
    ymask = np.where(np.arange(len(y)) < 100, y, np.nan)
    gs = GenomicSelection("GBLUP").fit(G, ymask)
    pred = gs.predict(np.arange(100, len(y)))
    assert len(pred) == len(y) - 100
    assert np.corrcoef(pred, y[100:])[0, 1] > 0.2
