"""GFF3 gene-interval index for hit annotation.

Replaces the reference's GffAnnotationIndex (/root/reference/src/io/
gffanno.rs) used by postgwas: per-chromosome sorted gene intervals with
binary-search window queries.
"""

from __future__ import annotations

import gzip
from bisect import bisect_left, bisect_right
from dataclasses import dataclass


@dataclass
class Gene:
    chrom: str
    start: int
    end: int
    name: str
    strand: str


class GffIndex:
    def __init__(self, genes):
        self.by_chrom: dict = {}
        for g in genes:
            self.by_chrom.setdefault(g.chrom, []).append(g)
        self.starts: dict = {}
        for c, lst in self.by_chrom.items():
            lst.sort(key=lambda g: g.start)
            self.starts[c] = [g.start for g in lst]

    @classmethod
    def from_file(cls, path: str, feature_types=("gene",)) -> "GffIndex":
        opener = gzip.open if str(path).endswith(".gz") else open
        genes = []
        with opener(path, "rt") as fh:
            for line in fh:
                if line.startswith("#"):
                    continue
                f = line.rstrip("\n").split("\t")
                if len(f) < 9 or f[2] not in feature_types:
                    continue
                attrs = {}
                for kv in f[8].split(";"):
                    if "=" in kv:
                        k, v = kv.split("=", 1)
                        attrs[k.strip()] = v.strip()
                name = (
                    attrs.get("Name")
                    or attrs.get("gene_name")
                    or attrs.get("ID")
                    or f"{f[0]}:{f[3]}-{f[4]}"
                )
                genes.append(
                    Gene(chrom=f[0], start=int(f[3]), end=int(f[4]),
                         name=name, strand=f[6])
                )
        return cls(genes)

    def query(self, chrom: str, pos: int, window: int = 0):
        """Genes overlapping [pos-window, pos+window]."""
        lst = self.by_chrom.get(str(chrom))
        if not lst:
            return []
        starts = self.starts[str(chrom)]
        lo = pos - window
        hi = pos + window
        # candidates: genes starting before hi; filter by end >= lo
        j = bisect_right(starts, hi)
        out = []
        for g in lst[max(0, j - 200):j]:  # bounded back-scan over long genes
            if g.end >= lo:
                out.append(g)
        return out

    def nearest(self, chrom: str, pos: int, max_dist: int = 1_000_000):
        hits = self.query(chrom, pos, 0)
        if hits:
            return hits[0], 0
        lst = self.by_chrom.get(str(chrom))
        if not lst:
            return None, None
        best, bd = None, max_dist + 1
        starts = self.starts[str(chrom)]
        j = bisect_left(starts, pos)
        for g in lst[max(0, j - 5): j + 5]:
            d = max(g.start - pos, pos - g.end, 0)
            if d < bd:
                best, bd = g, d
        if best is None or bd > max_dist:
            return None, None
        return best, bd
