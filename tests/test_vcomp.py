"""AI-REML variance-component tests (+ jx reml CLI on the rice example)."""

import os

import numpy as np
import pytest

from janusx_tpu.cli.main import main as jx_main
from janusx_tpu.models.vcomp import RandomTerm, ai_reml, onehot


def test_ai_reml_recovers_variances(rng):
    # y = Xb + Z u + e with known vg, ve on a line structure
    n_lines, reps = 150, 4
    N = n_lines * reps
    line = np.repeat(np.arange(n_lines), reps)
    levels, Z = onehot(line.astype(str))
    vg_true, ve_true = 2.0, 1.0
    # note: onehot sorts level labels lexicographically; build u on its order
    u = rng.normal(size=n_lines) * np.sqrt(vg_true)
    y = 5.0 + Z @ u + rng.normal(size=N) * np.sqrt(ve_true)
    X = np.ones((N, 1))
    res = ai_reml(y, X, [RandomTerm("line", Z, levels=levels)])
    assert res.converged
    assert res.sigma2["line"] == pytest.approx(vg_true, rel=0.35)
    assert res.sigma2["residual"] == pytest.approx(ve_true, rel=0.25)
    assert res.blue[0] == pytest.approx(5.0, abs=0.3)
    # BLUPs shrink toward truth
    r = np.corrcoef(res.blups["line"][1], u)[0, 1]
    assert r > 0.85


def test_ai_reml_matches_direct_loglik(rng):
    # verify reported loglik equals the direct REML formula at the optimum
    n_lines, reps = 60, 3
    N = n_lines * reps
    line = np.repeat(np.arange(n_lines), reps)
    _, Z = onehot(line.astype(str))
    y = Z @ rng.normal(size=n_lines) + rng.normal(size=N)
    X = np.ones((N, 1))
    res = ai_reml(y, X, [RandomTerm("line", Z)])
    sig = res.sigma2
    V = sig["line"] * (Z @ Z.T) + sig["residual"] * np.eye(N)
    Vi = np.linalg.inv(V)
    G = X.T @ Vi @ X
    P = Vi - Vi @ X @ np.linalg.inv(G) @ X.T @ Vi
    ll = -0.5 * (
        np.linalg.slogdet(V)[1] + np.linalg.slogdet(G)[1] + float(y @ P @ y)
    )
    assert res.loglik == pytest.approx(ll, abs=1e-6)


def test_reml_cli_rice(tmp_path):
    src = "/root/reference/example/rice6048.reml.tsv"
    if not os.path.exists(src):
        pytest.skip("rice example unavailable")
    import pandas as pd

    # subsample to ~200 lines to keep the test fast (full table: 3273 lines)
    lines = open(src).readlines()
    keep_ids = set()
    out_lines = [lines[0]]
    for ln in lines[1:]:
        lid = ln.split("\t", 1)[0]
        if len(keep_ids) < 200 or lid in keep_ids:
            keep_ids.add(lid)
            out_lines.append(ln)
    sub = str(tmp_path / "rice_sub.tsv")
    open(sub, "wt").writelines(out_lines)
    rc = jx_main([
        "reml", "-p", sub, "-n", "Plant_height", "-c", "year,loc",
        "-gxe", "loc", "-o", str(tmp_path), "-prefix", "rice",
    ])
    assert rc == 0
    summ = pd.read_csv(tmp_path / "rice.reml.summary.tsv", sep="\t")
    row = summ.iloc[0]
    assert row["trait"] == "Plant_height"
    assert row["used_lines"] == 200
    assert 0.5 < row["hsqr"] <= 1.0
    assert row["vg"] > 0 and row["ve"] > 0
    vc = pd.read_csv(tmp_path / "rice.vc.tsv", sep="\t")
    assert set(vc["term"]) >= {"lines", "residual", "linesxloc"}
    blue = pd.read_csv(tmp_path / "rice.blue.txt", sep="\t")
    blup = pd.read_csv(tmp_path / "rice.blup.txt", sep="\t")
    assert len(blue) == 200 and len(blup) == 200
    # line BLUEs sit on the phenotype scale (plant heights ~ 60-130)
    assert 40 < blue["Plant_height"].mean() < 160
    # BLUPs are centered line deviations, strongly rank-correlated with BLUEs
    r = np.corrcoef(blue["Plant_height"], blup["Plant_height"])[0, 1]
    assert r > 0.95


def test_reml_gxe_recovery(tmp_path):
    """Known-variance GxE simulation: H2 formula and component recovery."""
    import pandas as pd

    rng = np.random.default_rng(101)  # local: the session rng is order-dependent

    L, locs = 200, ["HZ", "HF", "WH"]
    vg, vgxe, ve = 2.0, 1.0, 1.0
    u = rng.normal(size=L) * np.sqrt(vg)
    ge = rng.normal(size=(L, 3)) * np.sqrt(vgxe)
    rows = []
    for l in range(L):
        for yi, yr in enumerate(["2022", "2023"]):
            for li, lc in enumerate(locs):
                y = 10 + u[l] + ge[l, li] + 1.5 * yi + rng.normal()
                rows.append((f"L{l:03d}", y, yr, lc))
    df = pd.DataFrame(rows, columns=["lines", "tr", "year", "loc"])
    pheno = str(tmp_path / "p.tsv")
    df.to_csv(pheno, sep="\t", index=False)
    rc = jx_main(["reml", "-p", pheno, "-n", "tr", "-c", "year,loc",
                  "-gxe", "loc", "-o", str(tmp_path), "-prefix", "g"])
    assert rc == 0
    import pandas as pd

    summ = pd.read_csv(tmp_path / "g.reml.summary.tsv", sep="\t").iloc[0]
    assert summ["vg"] == pytest.approx(vg, rel=0.4)
    assert summ["vge"] == pytest.approx(vgxe, rel=0.5)
    assert summ["ve"] == pytest.approx(ve, rel=0.35)
    # H2 = vg / (vg + vge/h_env + ve/h_plot) with h_env=3, h_plot=6
    expect = vg / (vg + vgxe / 3 + ve / 6)
    assert summ["hsqr"] == pytest.approx(expect, abs=0.08)
    assert summ["h_env"] == pytest.approx(3.0, abs=0.5)


def test_reml_narrow_sense_grm(tmp_path):
    """-k GRM attaches the joint additive+line narrow-sense stage + GBLUP."""
    import pandas as pd

    rng = np.random.default_rng(102)  # local: the session rng is order-dependent

    # family-structured genotypes: without real relatedness structure K≈I
    # and va·K / vline·I are unidentifiable (any split fits equally well)
    L, m, fam = 180, 600, 6
    freqs = rng.uniform(0.1, 0.9, size=m)
    G = np.empty((L, m))
    for f0 in range(0, L, fam):
        pa = (rng.random((2, m)) < freqs).astype(np.float64)
        pb = (rng.random((2, m)) < freqs).astype(np.float64)
        for l in range(f0, min(f0 + fam, L)):
            G[l] = pa[rng.integers(0, 2, m), np.arange(m)] + pb[
                rng.integers(0, 2, m), np.arange(m)]
    p = G.mean(0) / 2
    Z = (G - 2 * p) / np.sqrt(np.maximum(2 * p * (1 - p), 1e-6))
    K = Z @ Z.T / m
    ch = np.linalg.cholesky(K + 1e-6 * np.eye(L))
    va, vline, ve = 1.5, 0.5, 1.0
    u_add = ch @ rng.normal(size=L) * np.sqrt(va)
    u_line = rng.normal(size=L) * np.sqrt(vline)
    rows = []
    for l in range(L):
        for rep in range(4):
            y = 5 + u_add[l] + u_line[l] + rng.normal() * np.sqrt(ve)
            rows.append((f"L{l:03d}", y))
    pheno = str(tmp_path / "p.tsv")
    pd.DataFrame(rows, columns=["lines", "tr"]).to_csv(pheno, sep="\t", index=False)
    np.save(tmp_path / "k.npy", K)
    open(tmp_path / "k.id", "wt").write(
        "\n".join(f"L{l:03d}" for l in range(L)))
    rc = jx_main(["reml", "-p", pheno, "-n", "tr", "-k", str(tmp_path / "k.npy"),
                  "-o", str(tmp_path), "-prefix", "n"])
    assert rc == 0
    summ = pd.read_csv(tmp_path / "n.reml.summary.tsv", sep="\t").iloc[0]
    # narrow h2 on the BLUE scale: va / (va + vline + ve/4) = 0.667.
    # The va/vline split has ~0.1-0.15 estimator sd at 30 families x 6:
    # assert the estimate is in the right region, and rely on the GBLUP
    # accuracy check below as the sharp functional test.
    expect = va / (va + vline + ve / 4)
    assert summ["h2_narrow"] == pytest.approx(expect, abs=0.25)
    assert summ["narrow_method"] == "joint_dense"
    g = pd.read_csv(tmp_path / "n.gblup.txt", sep="\t")
    r = np.corrcoef(g["tr"], u_add)[0, 1]
    assert r > 0.75


def test_reml_gxc_slope_and_interaction(tmp_path):
    """-gxc random slopes + A:B fixed interaction parse and fit."""
    import pandas as pd

    rng = np.random.default_rng(103)  # local: the session rng is order-dependent

    L = 120
    u = rng.normal(size=L)
    slope = rng.normal(size=L) * 0.5
    rows = []
    for l in range(L):
        for yr in ["2022", "2023"]:
            for lc in ["HZ", "WH"]:
                t = (20.0 if lc == "HZ" else 28.0) + rng.normal()
                y = 3 + u[l] + slope[l] * (t - 24) / 4 + rng.normal() * 0.7
                rows.append((f"L{l:03d}", y, yr, lc, round(t, 2)))
    pheno = str(tmp_path / "p.tsv")
    pd.DataFrame(rows, columns=["lines", "tr", "year", "loc", "temp"]).to_csv(
        pheno, sep="\t", index=False)
    rc = jx_main(["reml", "-p", pheno, "-n", "tr", "-c", "year:loc",
                  "-gxc", "temp", "-o", str(tmp_path), "-prefix", "x"])
    assert rc == 0
    vc = pd.read_csv(tmp_path / "x.vc.tsv", sep="\t")
    terms = set(vc["term"])
    assert "linesxtemp:slope" in terms
    slope_var = float(vc.loc[vc["term"] == "linesxtemp:slope", "sigma2"].iloc[0])
    assert slope_var > 0.01  # real slope variance detected


def test_blue_line_nested_matches_dense_gls(rng):
    """Schur-complement BLUE == dense GLS with line-dummy fixed effects."""
    from janusx_tpu.models.lme import NestedTerm, blue_line_nested

    N, L, p = 90, 18, 3
    line = rng.integers(0, L, N)
    line[:L] = np.arange(L)
    X_env = rng.normal(size=(N, p))
    gxe = np.unique(line * 2 + rng.integers(0, 2, N), return_inverse=True)[1]
    y = rng.normal(size=N)
    sg, ve = 0.7, 1.3
    terms = [NestedTerm("gxe", gxe, np.ones(N), gxe.max() + 1)]
    blue, se, beta_env = blue_line_nested(y, X_env, line, terms, [sg], ve)
    Zg = np.zeros((N, gxe.max() + 1))
    Zg[np.arange(N), gxe] = 1
    V = ve * np.eye(N) + sg * Zg @ Zg.T
    Zl = np.zeros((N, L))
    Zl[np.arange(N), line] = 1
    Xf = np.concatenate([Zl, X_env], axis=1)
    Vi = np.linalg.inv(V)
    Ainv = np.linalg.inv(Xf.T @ Vi @ Xf)
    bhat = Ainv @ (Xf.T @ Vi @ y)
    np.testing.assert_allclose(blue, bhat[:L], rtol=1e-8)
    np.testing.assert_allclose(beta_env, bhat[L:], rtol=1e-8)
    np.testing.assert_allclose(se, np.sqrt(np.diag(Ainv)[:L]), rtol=1e-8)


def test_reml_narrow_sense_sparse_spk(tmp_path):
    """-spk keeps the kinship sparse end-to-end: the sparse-LU joint fit
    matches the dense objective on the same thresholded K."""
    import pandas as pd
    import scipy.sparse as sp

    from janusx_tpu.io.jxgrm import write_jxgrm
    from janusx_tpu.models.lme import fit_joint_kernel

    rng = np.random.default_rng(107)
    L, m, fam = 150, 500, 6
    freqs = rng.uniform(0.1, 0.9, size=m)
    G = np.empty((L, m))
    for f0 in range(0, L, fam):
        pa = (rng.random((2, m)) < freqs).astype(np.float64)
        pb = (rng.random((2, m)) < freqs).astype(np.float64)
        for l in range(f0, min(f0 + fam, L)):
            G[l] = pa[rng.integers(0, 2, m), np.arange(m)] + pb[
                rng.integers(0, 2, m), np.arange(m)]
    p = G.mean(0) / 2
    Z = (G - 2 * p) / np.sqrt(np.maximum(2 * p * (1 - p), 1e-6))
    K = Z @ Z.T / m
    Kt = np.where(np.abs(K) >= 0.05, K, 0.0)  # thresholded kinship
    np.fill_diagonal(Kt, np.diag(K))
    ch = np.linalg.cholesky(K + 1e-6 * np.eye(L))
    va, vline, ve = 1.5, 0.5, 1.0
    u_add = ch @ rng.normal(size=L) * np.sqrt(va)
    u_line = rng.normal(size=L) * np.sqrt(vline)
    y_line = 5 + u_add + u_line + rng.normal(size=L) * 0.2
    noise = np.full(L, 0.04)

    jd = fit_joint_kernel(y_line, Kt, noise)
    js = fit_joint_kernel(y_line, sp.csr_matrix(Kt), noise)
    assert js.va == pytest.approx(jd.va, rel=1e-4)
    assert js.vline == pytest.approx(jd.vline, rel=1e-4, abs=1e-8)
    assert js.h2 == pytest.approx(jd.h2, abs=1e-5)
    np.testing.assert_allclose(js.add_blup, jd.add_blup, rtol=1e-5, atol=1e-8)

    # CLI: -spk runs the sparse route
    rows = []
    for l in range(L):
        for rep in range(4):
            yy = 5 + u_add[l] + u_line[l] + rng.normal() * np.sqrt(ve)
            rows.append((f"L{l:03d}", yy))
    pheno = str(tmp_path / "p.tsv")
    pd.DataFrame(rows, columns=["lines", "tr"]).to_csv(pheno, sep="\t", index=False)
    spk = str(tmp_path / "k.spgrm")
    write_jxgrm(spk, sp.csc_matrix(Kt))
    open(spk + ".id", "wt").write("\n".join(f"L{l:03d}" for l in range(L)))
    rc = jx_main(["reml", "-p", pheno, "-n", "tr", "-spk", spk,
                  "-o", str(tmp_path), "-prefix", "sp"])
    assert rc == 0
    summ = pd.read_csv(tmp_path / "sp.reml.summary.tsv", sep="\t").iloc[0]
    assert summ["narrow_method"] == "joint_sparse"
    expect = va / (va + vline + ve / 4)
    assert summ["h2_narrow"] == pytest.approx(expect, abs=0.25)

    # --spk-mode fastgwa: fixed-Vp 1-D objective lands near the raw fit
    # (the raw optimum's total sits close to var(y) on this design)
    jf = fit_joint_kernel(y_line, sp.csr_matrix(Kt), noise, mode="fastgwa")
    assert np.isfinite(jf.h2) and 0.0 <= jf.h2 <= 1.0
    assert jf.h2 == pytest.approx(js.h2, abs=0.12)
    assert jf.va + jf.vline == pytest.approx(
        np.var(y_line) - noise.mean(), rel=1e-3)
    rc = jx_main(["reml", "-p", pheno, "-n", "tr", "-spk", spk,
                  "--spk-mode", "fastgwa",
                  "-o", str(tmp_path), "-prefix", "sf"])
    assert rc == 0
    summ2 = pd.read_csv(tmp_path / "sf.reml.summary.tsv", sep="\t").iloc[0]
    assert summ2["h2_narrow"] == pytest.approx(summ["h2_narrow"], abs=0.15)
