"""Training-stats plotting utilities.

Parity with the reference's matplotlib dump helpers (reference:
acai_omr/utils/utils.py:231-305, 372-384): loss/LR/tf-prob/tau curves from the
stats CSVs that MetricsWriter emits, plus an LR-schedule preview.
"""

from __future__ import annotations

from pathlib import Path


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def _fig(title, ylabel):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(12, 8))
    ax.set_title(title)
    ax.set_xlabel("Step")
    ax.set_ylabel(ylabel)
    ax.grid(True)
    return fig, ax


def plot_stats_csv(csv_path, out_dir, tags=None):
    """Render one PNG per scalar tag from a MetricsWriter CSV.

    Replaces graph_losses / graph_lrs / graph_tf_probs / graph_taus
    (utils.py:242-305) generically: any logged tag becomes a curve.
    """
    import pandas as pd

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = pd.read_csv(csv_path)
    written = []
    for tag in sorted(df["tag"].unique()):
        if tags and tag not in tags:
            continue
        sub = df[df["tag"] == tag].sort_values("step")
        fig, ax = _fig(tag, tag.rsplit("/", 1)[-1])
        ax.plot(sub["step"], sub["value"])
        name = tag.replace("/", "_") + ".png"
        fig.savefig(out_dir / name)
        _plt().close(fig)
        written.append(out_dir / name)
    return written


def plot_losses(csv_path, out_path, train_tag="epoch/train_loss",
                val_tag="epoch/val_loss"):
    """Train/validation curves on one figure (graph_losses parity)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    fig, ax = _fig("Training stats", "Average loss")
    for tag, label, color in ((train_tag, "Train loss", "blue"),
                              (val_tag, "Validation loss", "red")):
        sub = df[df["tag"] == tag].sort_values("step")
        if len(sub):
            ax.plot(sub["step"], sub["value"], label=label, color=color)
    ax.legend()
    fig.savefig(out_path)
    _plt().close(fig)
    return out_path


def plot_lr_schedule(schedule, num_steps, out_path):
    """Preview a step->lr schedule function (plot_lr_schedule parity,
    utils.py:372-384)."""
    import numpy as np

    steps = np.arange(num_steps)
    lrs = [float(schedule(s)) for s in steps]
    fig, ax = _fig("Learning rate over time using scheduler", "Learning rate")
    ax.plot(steps, lrs)
    fig.savefig(out_path)
    _plt().close(fig)
    return out_path
