"""Action-movement plots: per-action densities and mean movement vectors.

Replaces evaluation/plotting/{density_plot, density_plot_2d,
density_plot_2d_merged, mean_vector_plot_2d}.py (matplotlib/seaborn) with a
single headless-matplotlib module. Used by the playability evaluator to
visualize how the learned discrete actions partition object movements
(reconstructed_playability_dataset_evaluator.py:467-505).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def _flatten(actions: np.ndarray, vectors: np.ndarray, axes: Sequence[int]):
    actions = np.reshape(np.asarray(actions), (-1,))
    vectors = np.reshape(np.asarray(vectors), (-1, np.asarray(vectors).shape[-1]))
    return actions, vectors[:, list(axes)]


def plot_density_1d(
    actions: np.ndarray,
    values: np.ndarray,
    actions_count: int,
    output_path: str,
    prefix: str = "",
) -> str:
    """Per-action histogram+KDE of a scalar movement statistic
    (density_plot.py)."""
    plt = _plt()
    actions = np.reshape(np.asarray(actions), (-1,))
    values = np.reshape(np.asarray(values), (-1,))
    fig, ax = plt.subplots(figsize=(6, 4))
    for a in range(actions_count):
        sel = values[actions == a]
        if sel.size == 0:
            continue
        ax.hist(sel, bins=30, density=True, alpha=0.4, label=f"action {a}")
    ax.legend(fontsize=7)
    ax.set_title(f"{prefix}movement density")
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    fig.savefig(output_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return output_path


def plot_density_2d(
    actions: np.ndarray,
    vectors: np.ndarray,
    actions_count: int,
    output_directory: str,
    xlim: Optional[Tuple[float, float]] = None,
    ylim: Optional[Tuple[float, float]] = None,
    axes: Sequence[int] = (0, 1),
    prefix: str = "",
    merged: bool = False,
) -> Sequence[str]:
    """Per-action (or single merged) 2D movement scatter/density plots
    (density_plot_2d.py / density_plot_2d_merged.py): each plot shows the
    distribution of 2D movement vectors that a discrete action produced."""
    plt = _plt()
    actions, vectors = _flatten(actions, vectors, axes)
    if xlim is None and vectors.size:
        xlim = (float(vectors[:, 0].min()), float(vectors[:, 0].max()))
    if ylim is None and vectors.size:
        ylim = (float(vectors[:, 1].min()), float(vectors[:, 1].max()))
    os.makedirs(output_directory, exist_ok=True)
    cmap = _plt().get_cmap("tab10")

    written = []
    if merged:
        fig, ax = plt.subplots(figsize=(5, 5))
        for a in range(actions_count):
            sel = vectors[actions == a]
            if sel.size == 0:
                continue
            ax.scatter(sel[:, 0], sel[:, 1], s=4, alpha=0.35,
                       color=cmap(a % 10), label=f"{a}")
        ax.axhline(0.0, color="k", linewidth=0.5)
        ax.axvline(0.0, color="k", linewidth=0.5)
        if xlim:
            ax.set_xlim(*xlim)
        if ylim:
            ax.set_ylim(*ylim)
        ax.legend(fontsize=7, title="action")
        path = os.path.join(output_directory, f"{prefix}density_2d_merged.png")
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
        return written

    for a in range(actions_count):
        sel = vectors[actions == a]
        fig, ax = plt.subplots(figsize=(4, 4))
        if sel.size:
            ax.hist2d(sel[:, 0], sel[:, 1], bins=40,
                      range=[xlim, ylim] if xlim and ylim else None,
                      cmap="viridis")
        ax.axhline(0.0, color="w", linewidth=0.5)
        ax.axvline(0.0, color="w", linewidth=0.5)
        ax.set_title(f"{prefix}action {a}")
        path = os.path.join(output_directory, f"{prefix}density_2d_action_{a}.png")
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written


def plot_mean_vectors_2d(
    actions: np.ndarray,
    vectors: np.ndarray,
    actions_count: int,
    output_directory: str,
    axes: Sequence[int] = (0, 1),
    prefix: str = "",
) -> str:
    """One quiver of per-action mean movement vectors (mean_vector_plot_2d.py):
    a well-separated action space shows distinct arrows."""
    plt = _plt()
    actions, vectors = _flatten(actions, vectors, axes)
    means = np.zeros((actions_count, 2))
    for a in range(actions_count):
        sel = vectors[actions == a]
        if sel.size:
            means[a] = sel.mean(0)
    fig, ax = plt.subplots(figsize=(5, 5))
    cmap = plt.get_cmap("tab10")
    for a in range(actions_count):
        ax.annotate(
            "", xy=tuple(means[a]), xytext=(0, 0),
            arrowprops=dict(arrowstyle="->", color=cmap(a % 10), lw=2),
        )
        ax.text(means[a, 0], means[a, 1], str(a), fontsize=9,
                color=cmap(a % 10))
    lim = float(np.abs(means).max() or 1.0) * 1.2
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.axhline(0.0, color="k", linewidth=0.5)
    ax.axvline(0.0, color="k", linewidth=0.5)
    ax.set_title(f"{prefix}mean movement by action")
    os.makedirs(output_directory, exist_ok=True)
    path = os.path.join(output_directory, f"{prefix}mean_vectors_2d.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path
