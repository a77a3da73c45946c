"""Load trained checkpoints into the inference stack (train -> serve).

The training CLIs persist orbax trees: tools/train_scrfd.py saves the raw
variables dict ({'params', 'batch_stats'}) and ArcFaceTrainer
.save_checkpoint saves the full TrainState ({'backbone': variables,
'head_w', 'opt_state', 'step'}). This helper normalizes either layout into
the `variables` argument the inference wrappers take:

    det = Detector("det_500m", variables=load_inference_variables(path))
    emb = Embedder("w600k_mbf", variables=load_inference_variables(path))

(The ArcFace class head `head_w` is a training-only object — inference
uses the 512-d embedding, never class logits — so it is dropped here.)

Stem layouts reconcile automatically: training builds the plain (3,3,3,C)
stride-2 stem while the serving Detector defaults to the space-to-depth
stem — Detector converts the checkpoint's stem kernel on construction
(models/scrfd.py adapt_stem_variables, exact equivalence).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp


def load_inference_variables(path: str) -> Dict[str, Any]:
    """Orbax checkpoint (raw variables or ArcFace TrainState) ->
    {'params': ..., 'batch_stats': ...} for model.apply / Detector /
    Embedder."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckpt:
        data = ckpt.restore(os.path.abspath(path))
    if "backbone" in data:                       # ArcFace TrainState layout
        data = data["backbone"]
    if "params" not in data:
        raise ValueError(
            f"{path} is not a variables checkpoint (keys: {list(data)})")
    out: Dict[str, Any] = {"params": data["params"]}
    if data.get("batch_stats"):
        out["batch_stats"] = data["batch_stats"]
    return jax.tree.map(jnp.asarray, out)
