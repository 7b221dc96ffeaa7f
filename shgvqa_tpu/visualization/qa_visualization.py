"""Offline QA / situation-hypergraph visualization.

Rebuild of ``visualization_tools/qa_visualization.py`` (matplotlib plots of
keyframes, QA pairs, predicted situation graphs, attention heatmaps) without
the notebook-only dependencies (ipyplot).  All functions save to files —
this is an offline analysis tool, not part of the training path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def plot_clip(frames: np.ndarray, path: str, title: str = "",
              max_cols: int = 8) -> None:
    """Save a (T, H, W, 3) clip as a frame grid."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = frames.shape[0]
    cols = min(t, max_cols)
    rows = -(-t // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    axes = np.atleast_2d(axes)
    for i in range(rows * cols):
        ax = axes[i // cols, i % cols]
        ax.axis("off")
        if i < t:
            img = frames[i]
            if img.dtype != np.uint8:
                img = np.clip(img, 0, 1)
            ax.imshow(img)
            ax.set_title(f"t={i}", fontsize=8)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def plot_situation_hypergraph(
    rel_preds: np.ndarray,          # (S, R) predicted rel class ids
    act_preds: np.ndarray,          # (S, A) predicted act class ids
    path: str,
    rel_names: Optional[Dict[int, object]] = None,
    act_names: Optional[Dict[int, object]] = None,
    question: str = "",
    answer: str = "",
) -> None:
    """Per-situation table of predicted actions + relation triplets
    (background 0 omitted)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    s = rel_preds.shape[0]
    fig, ax = plt.subplots(figsize=(10, 0.5 * s + 2))
    ax.axis("off")
    lines = []
    for i in range(s):
        acts = [a for a in act_preds[i].tolist() if a != 0]
        rels = [r for r in rel_preds[i].tolist() if r != 0]
        act_str = ", ".join(
            str(act_names.get(a, a)) if act_names else str(a) for a in acts)
        rel_str = ", ".join(
            str(rel_names.get(r, r)) if rel_names else str(r) for r in rels)
        lines.append(f"s{i:02d}  acts: [{act_str}]  rels: [{rel_str}]")
    text = "\n".join(lines)
    header = ""
    if question:
        header += f"Q: {question}\n"
    if answer:
        header += f"A: {answer}\n"
    ax.text(0.01, 0.99, header + text, family="monospace", fontsize=8,
            va="top")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_attention(attn: np.ndarray, path: str,
                   query_labels: Optional[Sequence[str]] = None,
                   key_labels: Optional[Sequence[str]] = None,
                   title: str = "") -> None:
    """Save a (H, Lq, Lk) or (Lq, Lk) attention map (heads averaged)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if attn.ndim == 3:
        attn = attn.mean(0)
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(attn, aspect="auto", cmap="viridis")
    fig.colorbar(im, ax=ax)
    if query_labels is not None:
        ax.set_yticks(range(len(query_labels)))
        ax.set_yticklabels(query_labels, fontsize=6)
    if key_labels is not None:
        ax.set_xticks(range(len(key_labels)))
        ax.set_xticklabels(key_labels, fontsize=6, rotation=90)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
