"""Per-step metric accumulation and per-phase epoch averages.

Semantic clone of /root/reference/src/admmtor/etrain/logger.py — including
the detail that the epoch PSNR is recomputed from the MEAN MSE
(``10*log10(max^2 / mse_mean)``, logger.py:6-7, 49-51) rather than averaging
per-step PSNRs, and that requesting PSNR auto-registers MSE
(logger.py:28-34). Matching this changes reported values vs a naive mean and
is required for metric parity (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def psnr_compute(mse: float, max_val: float = 1.0) -> float:
    return float(10.0 * np.log10(max_val**2 / mse))


class MetricsLogger:
    def __init__(self, loss, metrics: Sequence):
        self._init_avg_stats(loss, metrics)
        self._init_step_stats()

    def __call__(self, phase: str = "train"):
        self.update_phase_avg_metrics(phase)

    def _init_avg_stats(self, loss, metrics):
        all_metrics = [loss] + list(metrics)
        self.metrics: Dict[str, Dict[str, List[float]]] = {
            "train": {m.m_name: [] for m in all_metrics},
            "eval": {m.m_name: [] for m in all_metrics},
        }

    def _init_step_stats(self):
        self._step_metrics: Dict[str, List[float]] = {
            k: [] for k in self.metrics["train"]
        }
        if "psnr" in self.metrics["train"] and "mse" not in self._step_metrics:
            self._step_metrics["mse"] = []
            self.metrics["train"]["mse"] = []
            self.metrics["eval"]["mse"] = []

    def reinit_step_stats(self):
        self._init_step_stats()

    def update_step_metric_val(self, metric_name: str, metric_val: float):
        self._step_metrics[metric_name].append(float(metric_val))

    def get_curr_step_metric_val(self, metric_name: str) -> float:
        return self._step_metrics[metric_name][-1]

    def get_curr_step_metrics(self) -> Dict[str, str]:
        return {k: f"{v[-1]:.4f}" for k, v in self._step_metrics.items() if v}

    def get_avg_metric_val(self, metric_name: str) -> float:
        if metric_name == "psnr":
            return psnr_compute(float(np.mean(self._step_metrics["mse"])))
        return float(np.mean(self._step_metrics[metric_name]))

    def update_phase_avg_metrics(self, phase: str):
        for metric_name in self._step_metrics:
            self.metrics[phase][metric_name].append(self.get_avg_metric_val(metric_name))

    def get_avg_metrics(self, phase: str) -> Dict[str, float]:
        return {name: vals[-1] for name, vals in self.metrics[phase].items() if vals}

    def get_logged(self, reformat: bool = True) -> dict:
        if reformat:
            out = {}
            for phase, metrics in self.metrics.items():
                for name, vals in metrics.items():
                    out[f"{phase}_{name}"] = vals
            return out
        return self.metrics
