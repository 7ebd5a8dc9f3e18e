"""Publication architecture figure — replaces
/root/reference/draw_convnet.py (matplotlib conv-net diagram): draws the
progressive 3-stage pipeline as feature-map boxes with stage annotations."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="architecture.png")
    p.add_argument("--stages", type=int, default=3)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import FancyArrow, Rectangle

    stage_labels = ["person mask (2)", "skeleton map (nSk+1)", "keypoints (nKp+1)"]
    fig, ax = plt.subplots(figsize=(3 + 4 * args.stages, 4))

    def box(x, y, w, h, color, label=None, label_below=None):
        ax.add_patch(Rectangle((x, y), w, h, facecolor=color, edgecolor="k", lw=0.8))
        if label:
            ax.text(x + w / 2, y + h + 0.12, label, ha="center", fontsize=8)
        if label_below:
            ax.text(x + w / 2, y - 0.25, label_below, ha="center", fontsize=8)

    # input + stem
    box(0.0, 1.0, 0.5, 2.0, "#cfe8ff", "input\n256²x3")
    box(0.9, 1.4, 0.5, 1.2, "#ffe0b3", "stem\n/4, f=256")
    ax.add_patch(FancyArrow(0.55, 2.0, 0.3, 0, width=0.02, head_width=0.12,
                            length_includes_head=True, color="k"))

    x = 1.9
    for i in range(args.stages):
        # hourglass trapezoid as stacked boxes
        for j, s in enumerate([1.2, 0.8, 0.5, 0.8, 1.2]):
            box(x + j * 0.35, 2.0 - s / 2, 0.3, s, "#d5f5d5")
        ax.text(x + 0.95, 3.0, f"ASPP hourglass {i + 1}", ha="center", fontsize=8)
        hx = x + 5 * 0.35 + 0.15
        label = stage_labels[i] if i < len(stage_labels) else f"stage {i + 1}"
        box(hx, 1.5, 0.4, 1.0, "#f5c6c6", None, label)
        if i < args.stages - 1:
            ax.text(hx + 0.9, 2.35, "concat\nreturn", ha="center", fontsize=7)
            ax.add_patch(FancyArrow(hx + 0.5, 2.0, 0.8, 0, width=0.02,
                                    head_width=0.12, length_includes_head=True,
                                    color="k"))
        x = hx + 1.4

    ax.set_xlim(-0.3, x + 0.4)
    ax.set_ylim(0.2, 3.6)
    ax.axis("off")
    ax.set_title("Progressive stacked-hourglass: mask → skeleton → keypoints")
    fig.savefig(args.out, bbox_inches="tight", dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
