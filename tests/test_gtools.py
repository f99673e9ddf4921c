"""gtools: annotation region queries + WGCNA pipeline."""

import numpy as np
import pytest


@pytest.fixture
def gff_file(tmp_path):
    p = tmp_path / "anno.gff3"
    p.write_text(
        "##gff-version 3\n"
        "Chr1\tsrc\tgene\t1000\t2000\t.\t+\t.\tID=GeneA;description=alpha\n"
        "Chr1\tsrc\tmRNA\t1000\t2000\t.\t+\t.\tID=GeneA.1\n"
        "Chr1\tsrc\tgene\t5000\t9000\t.\t-\t.\tID=GeneB\n"
        "Chr2\tsrc\tgene\t100\t400\t.\t+\t.\tID=GeneC\n"
    )
    return str(p)


def test_gffreader_and_query(gff_file):
    from janusx_tpu.gtools import GFFQuery, gffreader

    df = gffreader(gff_file)
    assert len(df) == 4
    assert set(df["chrom_norm"]) == {"1", "2"}
    assert df.loc[0, "attr_ID"] == "GeneA"
    assert df.loc[0, "attr_description"] == "alpha"

    q = GFFQuery(df.assign(feature=df["feature"]))
    hits = q.query_range("1", 1500, 6000, features="gene")
    assert list(hits["attribute"].str.contains("GeneA|GeneB")) == [True, True]
    # contained-only: GeneA (1000-2000) not fully inside [1500, 6000]
    inside = q.query_range("1", 1500, 6000, features="gene", overlap=False)
    assert len(inside) == 0
    inside2 = q.query_range("chr1", 900, 2100, features="gene", overlap=False)
    assert len(inside2) == 1
    assert len(q.query_range("3", 0, 10**9)) == 0
    assert len(q.query_point("2", 250)) == 1


def test_bedreader(tmp_path):
    from janusx_tpu.gtools import GFFQuery, bedreader

    p = tmp_path / "regions.bed"
    p.write_text("chr1\t999\t2000\tregA\nchr1\t4999\t9000\tregB\n")
    df = bedreader(str(p))
    assert list(df["start"]) == [1000, 5000]  # 0-based half-open -> 1-based
    q = GFFQuery(df)
    assert len(q.query_range(1, 1, 3000)) == 1


def test_wgcna_modules():
    from janusx_tpu.gtools import adj, cluster, cor, pick_soft_threshold, tom

    rng = np.random.default_rng(3)
    n, g = 60, 90
    # three planted modules driven by independent latent factors
    labels_true = np.repeat([0, 1, 2], g // 3)
    latent = rng.normal(size=(n, 3))
    expr = latent[:, labels_true] * 2.0 + rng.normal(size=(n, g)) * 0.7

    sim = cor(expr, "unsigned")
    assert sim.shape == (g, g)
    assert np.allclose(np.diag(sim), 1.0, atol=1e-5)
    # within-module similarity beats between-module
    within = sim[:30, :30][np.triu_indices(30, 1)].mean()
    between = sim[:30, 30:60].mean()
    assert within > between + 0.2

    power, table = pick_soft_threshold(sim, range(1, 13))
    assert 1 <= power <= 12 and len(table) >= 1

    A = adj(expr, sft=list(range(1, 13)))
    D = tom(A)
    assert D.shape == (g, g)
    assert np.allclose(np.diag(D), 0.0, atol=1e-5)
    assert (D >= -1e-6).all() and (D <= 1 + 1e-6).all()

    labels = cluster(D, min_cluster_size=10)
    assert labels.shape == (g,)
    # each planted module lands (mostly) in one detected module
    for k in range(3):
        block = labels[labels_true == k]
        vals, counts = np.unique(block[block > 0], return_counts=True)
        assert len(vals) >= 1
        assert counts.max() / len(block) > 0.8

    labs3 = cluster(D, min_cluster_size=10, num_modules=3)
    assert labs3.max() == 3


def test_wgcna_fallback_stamped_in_output(tmp_path):
    """When dynamicTreeCut is absent the flat-fcluster fallback must be
    recorded in the OUTPUT, not just the log (VERDICT r3 weak #8)."""
    import numpy as np

    from janusx_tpu.gtools import cluster, write_modules_tsv

    rng = np.random.default_rng(0)
    # two clean blocks -> two modules
    n = 40
    D = np.ones((n, n))
    D[:20, :20] = 0.1
    D[20:, 20:] = 0.1
    np.fill_diagonal(D, 0.0)
    D += rng.uniform(0, 0.02, size=(n, n))
    D = (D + D.T) / 2
    np.fill_diagonal(D, 0.0)
    labels, info = cluster(D, min_cluster_size=5, num_modules=2,
                           return_info=True)
    assert info["module_method"] in ("dynamicTreeCut", "fcluster-fallback")
    try:
        import dynamicTreeCut  # noqa: F401

        assert info["module_method"] == "dynamicTreeCut"
    except ImportError:
        assert info["module_method"] == "fcluster-fallback"
        assert info["pam_stage"] is False
    path = write_modules_tsv(str(tmp_path / "mod.tsv"),
                             [f"g{i}" for i in range(n)], labels, info)
    text = open(path).read()
    assert f"# module_method: {info['module_method']}" in text
    assert text.splitlines()[-1].startswith("g39\t")
