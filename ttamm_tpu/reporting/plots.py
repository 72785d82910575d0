"""Loss-curve plotting (Agg backend, headless-safe).

Parity with ``src/reporting/plots.py:15-68``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping, Sequence

import matplotlib

matplotlib.use("Agg", force=True)
import matplotlib.pyplot as plt  # noqa: E402


def save_loss_curves(
    loss_history: Mapping[str, Sequence[float]],
    *,
    output_path: Path | str,
    xlabel: str = "Epoch",
    ylabel: str = "BCE Loss",
    title: str = "Training / Validation / Test Loss",
) -> Path:
    """Save line plots for multiple loss series; raises on empty history."""
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)

    fig, ax = plt.subplots(figsize=(8, 5))
    has_data = False
    for label, values in loss_history.items():
        if not values:
            continue
        has_data = True
        ax.plot(range(1, len(values) + 1), values, marker="o", linestyle="-", label=label)

    if not has_data:
        plt.close(fig)
        raise ValueError("Loss history is empty; nothing to plot.")

    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(True, linestyle="--", linewidth=0.5, alpha=0.7)
    ax.legend()
    fig.tight_layout()
    fig.savefig(output_path, dpi=180)
    plt.close(fig)
    return output_path
