"""TOP trait-ordered ranking model tests (reference src/stats/top.rs)."""

import os

import numpy as np
import pytest

from janusx_tpu.gs.top import top_fit, top_rank


@pytest.fixture(scope="module")
def top_problem():
    rng = np.random.default_rng(7)
    n, k = 120, 3
    y_true = rng.normal(size=(n, k))
    y_pred = np.empty_like(y_true)
    # trait 0: highly informative predictions; trait 1: moderate; trait 2: noise
    y_pred[:, 0] = y_true[:, 0] + 0.1 * rng.normal(size=n)
    y_pred[:, 1] = y_true[:, 1] + 0.8 * rng.normal(size=n)
    y_pred[:, 2] = rng.normal(size=n)
    return y_true, y_pred


def test_top_fit_orders_weights_by_informativeness(top_problem):
    y_true, y_pred = top_problem
    model = top_fit(y_true, y_pred, traits=["a", "b", "c"])
    w = model.weights
    assert model.converged
    assert np.all(w >= 0)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-9)
    assert w[0] > w[1] > w[2], f"weights not ordered: {w}"
    assert w[0] > 0.5  # informative trait dominates


def test_top_fit_reduces_loss(top_problem):
    y_true, y_pred = top_problem
    m1 = top_fit(y_true, y_pred, max_iter=1, normalize=False)
    m50 = top_fit(y_true, y_pred, max_iter=50, normalize=False)
    assert m50.loss <= m1.loss + 1e-9


def test_top_rank_prefers_target_profile(top_problem):
    y_true, y_pred = top_problem
    model = top_fit(y_true, y_pred)
    scores = top_rank(model, y_pred, target="max")
    best = int(np.argmax(scores))
    # best candidate should be near the top of every weighted trait
    zp = (y_pred - model.true_mean) / model.true_sd
    weighted_rank = (zp * model.weights).sum(axis=1)
    assert best in np.argsort(-weighted_rank)[:10]
    # explicit raw-scale target equal to a candidate's own profile wins
    scores2 = top_rank(model, y_pred, target=np.asarray(y_pred[5]))
    assert int(np.argmax(scores2)) == 5


def test_top_handles_missing_truth():
    rng = np.random.default_rng(1)
    y_true = rng.normal(size=(60, 2))
    y_pred = y_true + 0.2 * rng.normal(size=(60, 2))
    y_true[::3, 0] = np.nan
    model = top_fit(y_true, y_pred)
    assert np.all(np.isfinite(model.weights))


def test_gs_workflow_top_bundle(tmp_path):
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.gs.workflow import GsConfig, run_gs

    rng = np.random.default_rng(5)
    m, n = 300, 150
    p = rng.uniform(0.1, 0.5, size=m)
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["C"] * m, object),
    )
    samples = np.array([f"i{j}" for j in range(n)], object)
    prefix = str(tmp_path / "topdata")
    plink.write_plink_genotypes(prefix, GenotypeData(g, sites, samples))
    gc = g.astype(np.float64) - g.mean(axis=1, keepdims=True)
    eff1 = rng.normal(size=m) * 0.2
    eff2 = rng.normal(size=m) * 0.2
    y1 = gc.T @ eff1
    y1 += rng.normal(size=n) * y1.std() * 0.7
    y2 = gc.T @ eff2
    y2 += rng.normal(size=n) * y2.std() * 0.7
    y1m, y2m = y1.copy(), y2.copy()
    y1m[-20:] = np.nan
    y2m[-20:] = np.nan
    with open(prefix + ".pheno", "wt") as fh:
        fh.write("\tta\ttb\n")
        for j in range(n):
            a = "NA" if np.isnan(y1m[j]) else f"{y1m[j]:.6f}"
            b = "NA" if np.isnan(y2m[j]) else f"{y2m[j]:.6f}"
            fh.write(f"{samples[j]}\t{a}\t{b}\n")
    out = str(tmp_path / "out" / "gs")
    cfg = GsConfig(
        genotype=prefix, phenotype=prefix + ".pheno", out_prefix=out,
        methods=("BLUP",), cv=3, maf=0.0, geno=1.0, select="max",
    )
    _, summary = run_gs(cfg)
    assert "top" in summary
    w = summary["top"]["weights"]
    assert len(w) == 2 and abs(sum(w) - 1.0) < 1e-9
    assert os.path.exists(out + ".gs.TOP.weights.tsv")
    assert os.path.exists(out + ".gs.TOP.jxmodel.npz")
    with open(out + ".gs.TOP.rank.tsv") as fh:
        lines = fh.read().strip().split("\n")
    assert lines[0].split("\t") == ["rank", "sample", "score", "pred_ta", "pred_tb"]
    assert len(lines) == n + 1  # every sample has OOF or test predictions
    bundle = np.load(out + ".gs.TOP.jxmodel.npz", allow_pickle=True)
    assert str(bundle["method"]) == "GS_TOP_BUNDLE"
    assert list(bundle["traits"]) == ["ta", "tb"]


def test_top_calibration_modes(top_problem):
    """--top-calibration (reference top.rs LinearCalibration): linear
    maps predictions onto the observed scale; addmean shifts by the
    trait mean; none is identity; rank-time predictions go through the
    same calibration."""
    import numpy as np

    y_true, y_pred = top_problem
    # distort predictions with a known affine map per trait
    a = np.array([2.0, -1.0, 0.5])
    b = np.array([3.0, 0.25, -2.0])
    y_warp = (y_pred - a[None, :]) / b[None, :]
    m_lin = top_fit(y_true, y_warp, calibration="linear")
    # the fitted calibration undoes the warp: cal(y_warp) ~ y_pred scale
    rec = m_lin.calibrate(y_warp)
    resid0 = np.abs(np.corrcoef(rec[:, 0], y_true[:, 0])[0, 1])
    raw0 = np.abs(np.corrcoef(y_warp[:, 0], y_true[:, 0])[0, 1])
    assert resid0 >= raw0 - 1e-12  # linear cal never hurts correlation
    # the fitted slope is b x the attenuation slope of true-on-pred
    # (OLS regression dilution), so compare against that product
    att = np.array([
        ((y_true[:, t] - y_true[:, t].mean())
         * (y_pred[:, t] - y_pred[:, t].mean())).mean()
        / y_pred[:, t].var()
        for t in range(3)
    ])
    assert np.allclose(m_lin.cal_slope, b * att, rtol=1e-6)
    m_none = top_fit(y_true, y_warp, calibration="none")
    assert np.allclose(m_none.cal_slope, 1.0)
    assert np.allclose(m_none.cal_intercept, 0.0)
    m_add = top_fit(y_true, y_warp, calibration="addmean")
    assert np.allclose(m_add.cal_slope, 1.0)
    mu = y_true.mean(axis=0)
    assert np.allclose(m_add.cal_intercept, mu, atol=0.2)
    # ranking is affine-invariant under linear calibration: warped and
    # unwarped predictions give the same candidate ordering
    m_ref = top_fit(y_true, y_pred, calibration="linear")
    s1 = top_rank(m_lin, y_warp)
    s2 = top_rank(m_ref, y_pred)
    assert np.corrcoef(np.argsort(np.argsort(s1)),
                       np.argsort(np.argsort(s2)))[0, 1] > 0.99
