"""`jx treeplot` — render a Newick tree as a dendrogram image
(reference: script/treeplot.py, toytree-based; here matplotlib)."""

from __future__ import annotations

import argparse

from janusx_tpu.cli import common


def parse_newick(text: str):
    """Minimal Newick parser -> nested (children, length, name) tuples."""
    text = text.strip().rstrip(";")
    pos = [0]

    def parse_node():
        children = []
        name = ""
        length = 0.0
        if text[pos[0]] == "(":
            pos[0] += 1
            while True:
                children.append(parse_node())
                if text[pos[0]] == ",":
                    pos[0] += 1
                    continue
                if text[pos[0]] == ")":
                    pos[0] += 1
                    break
        # label
        start = pos[0]
        while pos[0] < len(text) and text[pos[0]] not in ",():":
            pos[0] += 1
        name = text[start : pos[0]]
        if pos[0] < len(text) and text[pos[0]] == ":":
            pos[0] += 1
            start = pos[0]
            while pos[0] < len(text) and text[pos[0]] not in ",()":
                pos[0] += 1
            length = float(text[start : pos[0]])
        return (children, length, name)

    return parse_node()


def draw_tree(node, ax, x0=0.0, ycounter=[0]):
    children, length, name = node
    x1 = x0 + length
    if not children:
        y = ycounter[0]
        ycounter[0] += 1
        ax.plot([x0, x1], [y, y], color="#333", lw=0.9)
        ax.text(x1 + 0.001, y, " " + name, va="center", fontsize=6)
        return y
    ys = [draw_tree(c, ax, x1, ycounter) for c in children]
    y = sum(ys) / len(ys)
    ax.plot([x0, x1], [y, y], color="#333", lw=0.9)
    ax.plot([x1, x1], [min(ys), max(ys)], color="#333", lw=0.9)
    return y


def build_parser(prog="jx treeplot") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Plot a Newick tree")
    p.add_argument("-i", "--input", type=str, required=True, help=".nwk file")
    common.add_out_args(p, default_prefix="tree")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tree = parse_newick(open(args.input).read())

    def count_leaves(nd):
        return 1 if not nd[0] else sum(count_leaves(c) for c in nd[0])

    n = count_leaves(tree)
    fig, ax = plt.subplots(figsize=(6, max(2, n * 0.14)))
    draw_tree(tree, ax, 0.0, [0])
    ax.set_yticks([])
    ax.spines[["top", "right", "left"]].set_visible(False)
    ax.set_xlabel("distance")
    fig.tight_layout()
    out = prefix + ".tree.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    print(out)
    return 0
