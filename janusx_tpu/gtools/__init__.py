"""gtools — annotation readers, region queries, WGCNA helpers.

Reference: /root/reference/python/janusx/gtools/ (reader.py gffreader/
bedreader/GFFQuery, wgcna.py cor/adj/tom/cluster)."""

from janusx_tpu.gtools.reader import GFFQuery, bedreader, gffreader
from janusx_tpu.gtools.wgcna import (adj, cluster, cor, pick_soft_threshold,
                                     tom, write_modules_tsv)

__all__ = [
    "GFFQuery", "bedreader", "gffreader",
    "cor", "adj", "tom", "cluster", "pick_soft_threshold",
]
