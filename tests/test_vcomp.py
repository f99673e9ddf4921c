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
        "-o", str(tmp_path), "-prefix", "rice",
    ])
    assert rc == 0
    vc = dict(
        (l.split("\t")[0], float(l.split("\t")[1]))
        for l in open(str(tmp_path / "rice.vc.tsv")).readlines()[1:]
    )
    assert "lines" in vc and "residual" in vc
    assert vc["lines"] > 0
    blue = open(str(tmp_path / "rice.blue.tsv")).readlines()
    # intercept + year(1 level dropped) + loc(2 levels dropped-first)
    assert len(blue) >= 4
    assert os.path.exists(str(tmp_path / "rice.lines.blup.tsv"))
