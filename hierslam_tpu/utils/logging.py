"""Run metrics/observability (SURVEY.md §5.5).

A local metrics logger (JSONL + optional matplotlib plots) standing in for
the reference's wandb logging (utils/eval_helpers.py:277-339, report_loss);
wandb itself is used when installed and enabled.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class RunLogger:
    def __init__(self, out_dir: str, use_wandb: bool = False, wandb_cfg: Optional[Dict] = None):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.t0 = time.time()
        self._iter_counts: Dict[str, int] = {}
        self.last: Dict = {}  # most recent value per metric key
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(**(wandb_cfg or {}))
            except Exception as e:  # wandb genuinely optional
                print(f"wandb unavailable ({e}); logging locally only")

    def log(self, step: int, **metrics):
        rec = {"step": step, "t": round(time.time() - self.t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()})
        self.last.update({k: v for k, v in rec.items() if k not in ("step", "t")})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def log_iters(self, frame: int, phase: str, traces: Dict):
        """Per-iteration loss records for one tracking/mapping phase.

        Equivalent of the reference's per-iteration wandb logging
        (report_loss / report_loss_semantic, utils/eval_helpers.py:277-339):
        one record per optimizer iteration with the loss breakdown, keyed by
        a cumulative per-phase iteration counter.  ``traces`` maps component
        name -> [num_iters] array.
        """
        import numpy as np

        names = list(traces.keys())
        cols = {k: np.asarray(traces[k], dtype=np.float64) for k in names}
        n = len(cols[names[0]])
        base = self._iter_counts.get(phase, 0)
        for i in range(n):
            rec = {"step": frame, "phase": phase, "iter": base + i}
            rec.update({f"{phase}_{k}": float(cols[k][i]) for k in names})
            self._f.write(json.dumps(rec) + "\n")
            if self.wandb is not None:
                self.wandb.log(
                    {f"{phase.capitalize()}/{k}": float(cols[k][i]) for k in names}
                    | {f"{phase.capitalize()}/step": base + i},
                )
        self._iter_counts[phase] = base + n
        self._f.flush()

    def close(self):
        self._f.close()
        if self.wandb is not None:
            self.wandb.finish()


def plot_metrics(jsonl_path: str, out_png: str, keys=("tracking_loss", "mapping_loss")):
    """metrics.png equivalent (utils/eval_helpers.py:1623-1646)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = [json.loads(l) for l in open(jsonl_path)]
    fig, axes = plt.subplots(1, len(keys), figsize=(5 * len(keys), 3.5))
    if len(keys) == 1:
        axes = [axes]
    for ax, k in zip(axes, keys):
        xs = [r["step"] for r in rows if k in r]
        ys = [r[k] for r in rows if k in r]
        ax.plot(xs, ys)
        ax.set_title(k)
        ax.set_xlabel("frame")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    return out_png
