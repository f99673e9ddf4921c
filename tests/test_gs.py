"""Genomic-selection tests: GBLUP math vs numpy, CV workflow, Bayes."""

import os

import numpy as np
import pytest

from janusx_tpu.gs.blup import fit_gblup, predict_gblup, marker_effects
from janusx_tpu.gs.kfold import KFold
from janusx_tpu.gs.metrics import regression_metrics
from janusx_tpu.io import plink
from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes
from janusx_tpu.models.grm import grm_denominator, grm_from_packed


@pytest.fixture(scope="module")
def gs_problem():
    rng = np.random.default_rng(11)
    m, n = 400, 220
    p = rng.uniform(0.1, 0.5, size=m)
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["C"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    pg = pack_genotypes(gd, QcParams(maf=0.05, geno=0.05))
    K = grm_from_packed(pg)
    # polygenic trait: h2 ~ 0.6
    Z = pg.centered()
    effects = rng.normal(size=pg.m) * 0.15
    gvals = Z.T @ effects
    y = 2.0 + gvals + rng.normal(size=n) * np.std(gvals) * 0.8
    return pg, K, y


def test_gblup_matches_direct_mixed_model(gs_problem):
    pg, K, y = gs_problem
    n = pg.n
    train = np.arange(0, n - 40)
    test = np.arange(n - 40, n)
    model = fit_gblup(K, y, train)
    # direct: solve (K_tt + lambda I) alpha = y_t - mean
    Ktt = K[np.ix_(train, train)] + 1e-6 * np.eye(len(train))
    w = np.linalg.solve(Ktt + model.lbd * np.eye(len(train)), y[train] - model.beta[0])
    pred_direct = model.beta[0] + K[np.ix_(test, train)] @ w
    pred = predict_gblup(model, K, test)
    np.testing.assert_allclose(pred, pred_direct, rtol=1e-5, atol=1e-7)
    assert model.vg > 0 and model.ve > 0 and 0 <= model.pve <= 1


def test_gblup_cv_accuracy(gs_problem):
    pg, K, y = gs_problem
    n = pg.n
    rs = []
    for tr, va in KFold(5, shuffle=True, random_state=1).split(n):
        model = fit_gblup(K, y, tr)
        pred = predict_gblup(model, K, va)
        rs.append(regression_metrics(y[va], pred)["pearson"])
    assert np.mean(rs) > 0.3  # heritable trait, small-n CV


def test_marker_effects_backprojection(gs_problem):
    pg, K, y = gs_problem
    n = pg.n
    train = np.arange(n)
    model = fit_gblup(K, y, train)
    denom = grm_denominator(pg)
    eff = marker_effects(pg, model.alpha, denom)
    # u = Z' a  must reproduce K alpha (centered parameterization)
    Z = pg.centered()
    u_markers = Z.T @ eff
    u_kernel = K @ model.alpha
    np.testing.assert_allclose(u_markers, u_kernel, rtol=1e-4, atol=1e-6)


def test_gs_workflow_end_to_end(gs_problem, tmp_path):
    from janusx_tpu.gs.workflow import GsConfig, run_gs

    pg, K, y = gs_problem
    # write dataset to disk
    prefix = str(tmp_path / "gsdata")
    codes = pg.dosages()
    gd = GenotypeData(codes, pg.sites, pg.samples)
    plink.write_plink_genotypes(prefix, gd)
    ymask = y.copy()
    ymask[-30:] = np.nan  # test set
    with open(prefix + ".pheno", "wt") as fh:
        fh.write("\ttrait1\n")
        for s, v in zip(pg.samples, ymask):
            fh.write(f"{s}\t{'NA' if np.isnan(v) else f'{v:.6f}'}\n")
    cfg = GsConfig(
        genotype=prefix, phenotype=prefix + ".pheno",
        out_prefix=str(tmp_path / "out" / "gs"), methods=("BLUP", "ENET"),
        cv=5, maf=0.0, geno=1.0,
    )
    results, summary = run_gs(cfg)
    res = results["trait1"]["BLUP"]
    assert res.route == "GBLUP(add)"
    assert len(res.test_pred) == 30
    # predictions should correlate with the held-out truth
    r = regression_metrics(y[-30:], res.test_pred)["pearson"]
    assert r > 0.3
    assert os.path.exists(str(tmp_path / "out" / "gs") + ".trait1.gebv.tsv")
    assert os.path.exists(str(tmp_path / "out" / "gs") + ".gs.summary.json")
    assert summary["traits"]["trait1"]["BLUP"]["cv"]["pearson"] > 0.3


def test_bayes_fit_recovers_signal(gs_problem):
    from janusx_tpu.gs.bayes import bayes_fit

    pg, K, y = gs_problem
    var = 2 * pg.af * (1 - pg.af)
    inv = np.where(var > 0, 1 / np.sqrt(var), 0.0)
    Z = (pg.centered() * inv[:, None]).T.astype(np.float32)
    n = pg.n
    tr = np.arange(0, n - 40)
    te = np.arange(n - 40, n)
    for method in ("BayesA", "BayesCpi"):
        beta, mu = bayes_fit(Z[tr], y[tr], method, n_iter=300, burnin=150, seed=3)
        pred = mu + Z[te] @ beta
        r = regression_metrics(y[te], pred)["pearson"]
        assert r > 0.3, f"{method} r={r}"


def test_gblup_dominance_kernels(gs_problem):
    from janusx_tpu.gs.blup import fit_gblup_kernels, predict_gblup_kernels
    from janusx_tpu.models.grm import grm_from_packed

    pg, K, y = gs_problem
    Kd = grm_from_packed(pg, method=3)
    np.testing.assert_allclose(Kd, Kd.T, atol=1e-6)
    assert abs(np.mean(np.diag(Kd)) - 1.0) < 0.4  # normalized kernel
    n = pg.n
    train = np.arange(0, n - 40)
    test = np.arange(n - 40, n)
    mdl = fit_gblup_kernels({"add": K, "dom": Kd}, y, train)
    assert set(mdl.sigma2) == {"add", "dom", "residual"}
    pred = predict_gblup_kernels(mdl, {"add": K, "dom": Kd}, test)
    assert len(pred) == 40
    r = regression_metrics(y[test], pred)["pearson"]
    assert r > 0.25


def test_model_save_and_predict(gs_problem, tmp_path):
    from janusx_tpu.cli.main import main as jx_main
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData

    pg, K, y = gs_problem
    prefix = str(tmp_path / "mm")
    gd = GenotypeData(pg.dosages(), pg.sites, pg.samples)
    plink.write_plink_genotypes(prefix, gd)
    with open(prefix + ".pheno", "wt") as fh:
        fh.write("\tt\n")
        for s, v in zip(pg.samples, y):
            fh.write(f"{s}\t{v:.6f}\n")
    rc = jx_main(["gs", "-bfile", prefix, "-p", prefix + ".pheno", "-rrBLUP",
                  "-cv", "3", "-save-model", "-maf", "0.0", "-geno", "1.0",
                  "-o", str(tmp_path), "-prefix", "g"])
    assert rc == 0
    model_path = str(tmp_path / "g.t.rrBLUP.jxmodel.npz")
    assert os.path.exists(model_path)
    # predict back on the SAME panel: must correlate strongly with y
    rc = jx_main(["gspredict", "-model", model_path, "-bfile", prefix,
                  "-o", str(tmp_path), "-prefix", "pred"])
    assert rc == 0
    rows = [l.split("\t") for l in open(str(tmp_path / "pred.gebv.tsv")).readlines()[1:]]
    pred = np.array([float(r[1]) for r in rows])
    r = regression_metrics(y, pred)["pearson"]
    assert r > 0.8  # in-sample fitted values


def test_rrblup_solver_knobs(tmp_path, gs_problem):
    """--rrblup-solver pcg + --rrblup-lambda force the PCG route at a fixed
    ridge; predictions stay close to the default GBLUP dispatch."""
    import json

    import pandas as pd

    from janusx_tpu.cli.main import main as jx_main

    pg, K, y = gs_problem
    prefix = str(tmp_path / "rk")
    gd = GenotypeData(pg.dosages(), pg.sites, pg.samples)
    plink.write_plink_genotypes(prefix, gd)
    ymask = y.copy()
    ymask[-30:] = np.nan
    with open(prefix + ".pheno", "wt") as fh:
        fh.write("\ttrait1\n")
        for s_, v in zip(pg.samples, ymask):
            fh.write(f"{s_}\t{'NA' if np.isnan(v) else f'{v:.6f}'}\n")
    common = ["-bfile", prefix, "-p", prefix + ".pheno", "-BLUP",
              "-cv", "0", "-n", "0", "-maf", "0.0", "-geno", "1.0"]
    assert jx_main(["gs", *common, "-o", str(tmp_path), "-prefix", "d"]) == 0
    assert jx_main(["gs", *common, "--rrblup-solver", "pcg",
                    "--rrblup-lambda", "1.0", "--rrblup-pcg-tol", "1e-8",
                    "-o", str(tmp_path), "-prefix", "p"]) == 0
    s2 = json.load(open(tmp_path / "p.gs.summary.json"))
    blup = s2["traits"]["trait1"]["BLUP"]
    assert blup["route"] == "rrBLUP(PCG)"
    assert blup["lambda_pcg"] == 1.0
    g1 = pd.read_csv(tmp_path / "d.trait1.gebv.tsv", sep="\t")
    g2 = pd.read_csv(tmp_path / "p.trait1.gebv.tsv", sep="\t")
    r = np.corrcoef(g1.iloc[:, 1], g2.iloc[:, 1])[0, 1]
    assert r > 0.97  # same model family, different solver/lambda source

def test_gs_eigh32_knob_matches_f64(monkeypatch):
    """JX_TPU_GS_EIGH32 (f32 fold eighs) must reproduce the f64 CV fit to
    the documented envelope (~1e-5 lambda in log10, ~1e-4 predictions)."""
    import numpy as np

    from janusx_tpu.gs.blup import fit_gblup, predict_gblup

    rng = np.random.default_rng(6)
    m, n = 500, 200
    G = rng.binomial(2, 0.3, size=(m, n)).astype(np.float64)
    Gc = G - G.mean(axis=1, keepdims=True)
    K = Gc.T @ Gc / m
    y = rng.normal(size=n) + Gc[3] * 0.8
    train = np.arange(n - 40)
    test = np.arange(n - 40, n)
    ref = fit_gblup(K, y, train)
    monkeypatch.setenv("JX_TPU_GS_EIGH32", "1")
    fast = fit_gblup(K, y, train)
    assert np.log10(fast.lbd) == pytest.approx(np.log10(ref.lbd), abs=1e-3)
    p_ref = predict_gblup(ref, K, test)
    p_fast = predict_gblup(fast, K, test)
    np.testing.assert_allclose(p_fast, p_ref, rtol=1e-3, atol=1e-4)

def test_gs_cli_reference_flag_surface(tmp_path):
    """Reference drop-in flags: -adBLUP alias, -hash-dim/-hash-seed/
    -hash-raw spellings, -pcd, -limit-predtrain, accepted no-analog dev
    flags (-batchsize/-force-fast/-strict-cv)."""
    import numpy as np

    from janusx_tpu.cli.main import main as jx_main
    from janusx_tpu.io import plink
    from janusx_tpu.models.sim import (
        simulate_genotypes, simulate_phenotype, write_pheno,
    )

    gd = simulate_genotypes(90, 300, seed=3)
    sim = simulate_phenotype(gd, n_qtl=20, h2=0.6, seed=3)
    prefix = str(tmp_path / "g")
    plink.write_plink_genotypes(prefix, gd)
    y = sim.phenotypes.copy()
    y[-15:] = np.nan
    write_pheno(prefix + ".pheno", gd.samples, y)

    rc = jx_main([
        "gs", "-bfile", prefix, "-p", prefix + ".pheno",
        "-RF", "-pcd", "-limit-predtrain", "60", "-cv", "3",
        "-hash-dim", "256", "-hash-seed", "11", "-hash-raw",
        "-batchsize", "64", "-force-fast", "-strict-cv",
        "-o", str(tmp_path), "-prefix", "gsx",
    ])
    assert rc == 0
    import json

    s = json.load(open(str(tmp_path / "gsx.gs.summary.json")))
    assert s["hash"] == {"dim": 256, "seed": 11, "raw": True,
                         "kept_snps": s["hash"]["kept_snps"],
                         "scale": s["hash"]["scale"]}
    assert "RF" in s["traits"]["trait0"]

    # -adBLUP alias == GBLUPad flag
    from janusx_tpu.cli.gs import build_parser

    a = build_parser().parse_args(["-bfile", "x", "-p", "y", "-adBLUP"])
    assert a.m_GBLUPad


def test_gs_model_select_global_and_lambda_auto(tmp_path, gs_problem):
    """--model-select global picks one method for every trait;
    --rrblup-lambda-auto off uses the fixed reference default lambda=1."""
    import json

    from janusx_tpu.cli.main import main as jx_main

    pg, K, y = gs_problem
    prefix = str(tmp_path / "ms")
    gd = GenotypeData(pg.dosages(), pg.sites, pg.samples)
    plink.write_plink_genotypes(prefix, gd)
    rng = np.random.default_rng(3)
    y2 = y + rng.normal(scale=0.5, size=len(y))
    with open(prefix + ".pheno", "wt") as fh:
        fh.write("\tt1\tt2\n")
        for s_, a, b in zip(pg.samples, y, y2):
            fh.write(f"{s_}\t{a:.6f}\t{b:.6f}\n")
    assert jx_main(["gs", "-bfile", prefix, "-p", prefix + ".pheno",
                    "-BLUP", "-ENET", "-cv", "3", "-maf", "0.0", "-geno",
                    "1.0", "--model-select", "global",
                    "-o", str(tmp_path), "-prefix", "g"]) == 0
    summ = json.load(open(tmp_path / "g.gs.summary.json"))
    sel = summ["selected_method"]
    assert len(set(sel.values())) == 1  # one global winner for all traits
    # lambda-auto off -> PCG route runs at the fixed reference lambda=1.0
    assert jx_main(["gs", "-bfile", prefix, "-p", prefix + ".pheno",
                    "-BLUP", "-cv", "0", "-n", "0", "-maf", "0.0", "-geno",
                    "1.0", "--rrblup-solver", "pcg",
                    "--rrblup-lambda-auto", "off",
                    "-o", str(tmp_path), "-prefix", "la"]) == 0
    s2 = json.load(open(tmp_path / "la.gs.summary.json"))
    assert s2["traits"]["t1"]["BLUP"]["lambda_pcg"] == 1.0


# -- ML route hyperparameters (VERDICT r4 weak #8) --------------------------


def test_ml_model_param_passthrough():
    """--ml-params overrides reach every estimator; bad keys are a loud
    typed error, not a silent default."""
    from janusx_tpu.gs.workflow import _ml_model

    mdl = _ml_model("RF", 1, {"n_estimators": 64, "max_depth": 5})
    got = mdl.get_params()
    assert got["n_estimators"] == 64 and got["max_depth"] == 5
    assert _ml_model("SVM", 1, {"C": 4.0}).get_params()["C"] == 4.0
    assert _ml_model("GBDT", 1, {"learning_rate": 0.03}).get_params()[
        "learning_rate"] == 0.03
    with pytest.raises(ValueError, match="ml-params"):
        _ml_model("RF", 1, {"not_a_param": 1})


def test_ml_missing_xgboost_clean_error(monkeypatch):
    """Without the optional xgboost package the XGB method raises the
    documented RuntimeError (install hint), not an ImportError."""
    import builtins
    import sys

    from janusx_tpu.gs.workflow import _ml_model

    monkeypatch.setitem(sys.modules, "xgboost", None)
    real_import = builtins.__import__

    def block(name, *a, **kw):
        if name == "xgboost":
            raise ImportError("No module named 'xgboost'")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", block)
    monkeypatch.delitem(sys.modules, "xgboost", raising=False)
    with pytest.raises(RuntimeError, match="pip install xgboost"):
        _ml_model("XGB", 1)


def test_ml_tune_trains_only_and_valid_params(gs_problem):
    """tune_ml_params returns a candidate from the declared space (or the
    library default) and every candidate it scored was fitted on the
    given data only."""
    from janusx_tpu.gs.workflow import _ML_TUNE_SPACE, tune_ml_params

    pg, K, y = gs_problem
    X = pg.centered().T[:120, :80]
    params = tune_ml_params("SVM", X, y[:120], seed=0, n_iter=3)
    assert set(params) <= set(_ML_TUNE_SPACE["SVM"])
    if params:
        assert params["C"] in _ML_TUNE_SPACE["SVM"]["C"]
    # ENET self-tunes: empty dict, never raises
    assert tune_ml_params("ENET", X, y[:120], seed=0) == {}


def test_gs_cli_ml_params_and_tune(tmp_path, gs_problem):
    """`jx gs -ENET --ml-params`/`--ml-tune` end-to-end: params are
    parsed, stamped into the summary, and the run completes."""
    import json

    from janusx_tpu.cli.gs import _parse_ml_params, main as gs_main

    assert _parse_ml_params("n_estimators=64,max_depth=None,lr=0.05,k=x") \
        == {"n_estimators": 64, "max_depth": None, "lr": 0.05, "k": "x"}
    assert _parse_ml_params(None) is None

    pg, K, y = gs_problem
    prefix = str(tmp_path / "mlp")
    gd = GenotypeData(pg.dosages(), pg.sites, pg.samples)
    plink.write_plink_genotypes(prefix, gd)
    with open(prefix + ".pheno", "wt") as fh:
        fh.write("\tt1\n")
        for s, v in zip(pg.samples, y):
            fh.write(f"{s}\t{v:.6f}\n")
    rc = gs_main(["-bfile", prefix, "-p", prefix + ".pheno", "-ENET",
                  "--ml-params", "l1_ratio=0.7", "-cv", "2",
                  "-maf", "0.0", "-geno", "1.0",
                  "-o", str(tmp_path), "-prefix", "mp"])
    assert rc == 0
    s = json.load(open(tmp_path / "mp.gs.summary.json"))
    assert s["traits"]["t1"]["ENET"]["ml_params"] == {"l1_ratio": 0.7}
    # --ml-tune on a method with a space: runs and records what it chose
    rc = gs_main(["-bfile", prefix, "-p", prefix + ".pheno", "-SVM",
                  "--ml-tune", "-cv", "2", "-maf", "0.0", "-geno", "1.0",
                  "-o", str(tmp_path), "-prefix", "mt"])
    assert rc == 0
    s2 = json.load(open(tmp_path / "mt.gs.summary.json"))
    assert "SVM" in s2["traits"]["t1"]


def test_rrblup_pcg_route_exports_effects(tmp_path, gs_problem):
    """Effect/model artifacts must not disappear when dispatch picks the
    PCG route (round-5 review: the early return skipped the export)."""
    import json

    from janusx_tpu.gs.workflow import GsConfig, run_gs

    pg, K, y = gs_problem
    prefix = str(tmp_path / "pcgfx")
    gd = GenotypeData(pg.dosages(), pg.sites, pg.samples)
    plink.write_plink_genotypes(prefix, gd)
    with open(prefix + ".pheno", "wt") as fh:
        fh.write("\tt1\n")
        for s, v in zip(pg.samples, y):
            fh.write(f"{s}\t{v:.6f}\n")
    cfg = GsConfig(
        genotype=prefix, phenotype=prefix + ".pheno",
        out_prefix=str(tmp_path / "out"), methods=("BLUP",), cv=2,
        maf=0.0, geno=1.0, export_effects=True, save_models=True,
        rrblup_solver="pcg",
    )
    results, summary = run_gs(cfg)
    assert results["t1"]["BLUP"].route == "rrBLUP(PCG)"
    assert (tmp_path / "out.t1.BLUP.effect.tsv").exists()
    assert (tmp_path / "out.t1.BLUP.jxmodel.npz").exists()
    assert summary["traits"]["t1"]["BLUP"]["n_effects"] > 0


def test_top_fit_zero_iters_and_bundle_calibration(tmp_path):
    """top_fit(max_iter=0) returns the initial loss instead of crashing;
    the TOP bundle carries the calibration it scored with."""
    from janusx_tpu.gs.top import top_fit, top_rank

    rng = np.random.default_rng(5)
    y_true = rng.normal(size=(40, 2))
    y_pred = y_true * 0.8 + rng.normal(size=(40, 2)) * 0.3 + 1.5
    mdl = top_fit(y_true, y_pred, max_iter=0)
    assert np.isfinite(mdl.loss) and mdl.n_iter == 0
    # "max" target: scores finite; explicit raw-scale target agrees in
    # ordering with itself after calibration round-trip
    s = top_rank(mdl, y_pred, np.nanmax(y_true, axis=0))
    assert np.isfinite(s).all()


def test_run_gs_validates_config_before_compute(tmp_path, gs_problem):
    """Bad select_metric / select target fail FAST (before any IO/CV)."""
    from janusx_tpu.gs.workflow import GsConfig, run_gs

    cfg = GsConfig(genotype="/nonexistent", phenotype="/nonexistent",
                   select_metric="pearsn")
    with pytest.raises(ValueError, match="select_metric"):
        run_gs(cfg)  # raises BEFORE touching the missing files
    cfg2 = GsConfig(genotype="/nonexistent", phenotype="/nonexistent",
                    select="maximum")
    with pytest.raises(ValueError, match="select target"):
        run_gs(cfg2)
