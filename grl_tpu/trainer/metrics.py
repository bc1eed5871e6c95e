"""Classification metrics: device-side confusion matrix + host macro scores.

The reference calls sklearn's ``classification_report`` on every training
step with a device->host sync (reference: gnn/trainer/training_procedures/
kv_procedure.py:61-104 — flagged in SURVEY.md as the CPU bottleneck).
Here each step only accumulates a ``C x C`` confusion matrix on device
(one scatter-add fused into the step); macro precision/recall/F1 are
computed from it on host with sklearn-identical semantics:

* entries whose target is the padding value or the configured "other"
  class are dropped (kv_procedure.py:80-84);
* the macro average runs over the union of classes present in targets or
  predictions, ``zero_division=0``.
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    num_classes: int,
    ignore_values: Iterable[int] = (-100,),
) -> jnp.ndarray:
    """Masked ``(C, C)`` confusion counts ``cm[target, pred]`` on device."""
    mask = jnp.ones(targets.shape, dtype=bool)
    for value in ignore_values:
        if value is None:
            continue
        mask &= targets != value
    flat_t = jnp.where(mask, targets, 0).reshape(-1)
    flat_p = preds.reshape(-1)
    flat_m = mask.reshape(-1).astype(jnp.float32)
    cm = jnp.zeros((num_classes, num_classes), jnp.float32)
    return cm.at[flat_t, flat_p].add(flat_m)


def macro_scores(cm: np.ndarray) -> Dict[str, float]:
    """sklearn ``classification_report``-style macro avg from a confusion
    matrix (zero_division=0, averaged over present classes)."""
    cm = np.asarray(cm, dtype=np.float64)
    support = cm.sum(axis=1)
    predicted = cm.sum(axis=0)
    present = np.nonzero((support > 0) | (predicted > 0))[0]
    if len(present) == 0:
        return {"precision": 0.0, "recall": 0.0, "f1-score": 0.0, "support": 0.0}
    tp = np.diag(cm)[present]
    precision = np.where(predicted[present] > 0, tp / np.maximum(predicted[present], 1e-12), 0.0)
    recall = np.where(support[present] > 0, tp / np.maximum(support[present], 1e-12), 0.0)
    denom = precision + recall
    f1 = np.where(denom > 0, 2 * precision * recall / np.maximum(denom, 1e-12), 0.0)
    return {
        "precision": float(precision.mean()),
        "recall": float(recall.mean()),
        "f1-score": float(f1.mean()),
        "support": float(support[present].sum()),
    }


def per_class_report(
    cm: np.ndarray, class_names: Optional[Tuple[str, ...]] = None
) -> str:
    """Readable per-class P/R/F1 table (epoch-level classification report,
    reference: kv_procedure.py:232-241)."""
    cm = np.asarray(cm, dtype=np.float64)
    support = cm.sum(axis=1)
    predicted = cm.sum(axis=0)
    present = np.nonzero((support > 0) | (predicted > 0))[0]
    lines = [f"{'class':<32}{'precision':>10}{'recall':>10}{'f1':>10}{'support':>10}"]
    for c in present:
        tp = cm[c, c]
        p = tp / predicted[c] if predicted[c] > 0 else 0.0
        r = tp / support[c] if support[c] > 0 else 0.0
        f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
        name = class_names[c] if class_names and c < len(class_names) else str(c)
        lines.append(f"{name:<32}{p:>10.4f}{r:>10.4f}{f1:>10.4f}{int(support[c]):>10}")
    macro = macro_scores(cm)
    lines.append(
        f"{'macro avg':<32}{macro['precision']:>10.4f}{macro['recall']:>10.4f}"
        f"{macro['f1-score']:>10.4f}{int(macro['support']):>10}"
    )
    return "\n".join(lines)
