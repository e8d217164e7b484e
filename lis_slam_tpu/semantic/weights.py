"""RangeNet checkpoint save/load (npz) + the in-repo synthetic checkpoint.

The reference distributes a pretrained darknet53 TensorRT engine downloaded
out-of-band (README.md §4, rangenet_lib model dir with arch_cfg.yaml +
weights); this environment has no egress, so the shipped checkpoint is a
slim RangeNet trained on the synthetic world (scripts/
train_rangenet_synthetic.py) — enough to run the full config-3 pipeline
with *inferred* labels end-to-end. `load_onnx` sketches the importer seam
for the released weights when they are available.

Format: flat npz of params (float16) + batch_stats (float32), keys are
'/'-joined pytree paths, plus a JSON header with the SemanticConfig fields
the architecture depends on.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import SemanticConfig

DEFAULT_CHECKPOINT = os.path.join(
    os.path.dirname(__file__), "..", "weights", "rangenet_synthetic_slim.npz"
)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(path: str, variables: dict, cfg: SemanticConfig,
                    meta: dict | None = None):
    """variables = {'params': ..., 'batch_stats': ...} (flax format)."""
    flat = {}
    for k, v in _flatten(variables["params"], "params").items():
        flat[k] = v.astype(np.float16)
    for k, v in _flatten(variables.get("batch_stats", {}), "batch_stats").items():
        flat[k] = v.astype(np.float32)
    header = {
        "num_classes": cfg.num_classes,
        "enc_blocks": list(cfg.enc_blocks),
        "enc_widths": list(cfg.enc_widths),
        "dec_widths": list(cfg.dec_widths),
        "img_means": list(cfg.img_means),
        "img_stds": list(cfg.img_stds),
        **(meta or {}),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(header), **flat)


def load_checkpoint(path: str | None = None):
    """Returns (SemanticConfig, variables) ready for model.apply.

    Raises FileNotFoundError if no checkpoint exists at `path` (or the
    default in-repo location)."""
    import jax.numpy as jnp

    path = path or DEFAULT_CHECKPOINT
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    cfg = SemanticConfig(
        enabled=True,
        num_classes=int(meta["num_classes"]),
        enc_blocks=tuple(meta["enc_blocks"]),
        enc_widths=tuple(meta["enc_widths"]),
        dec_widths=tuple(meta["dec_widths"]),
        img_means=tuple(meta["img_means"]),
        img_stds=tuple(meta["img_stds"]),
    )
    flat = {}
    for k in data.files:
        if k == "__meta__":
            continue
        arr = data[k]
        flat[k] = jnp.asarray(
            arr.astype(np.float32) if arr.dtype == np.float16 else arr)
    tree = _unflatten(flat)
    variables = {"params": tree.get("params", {})}
    if "batch_stats" in tree:
        variables["batch_stats"] = tree["batch_stats"]
    return cfg, variables


def load_onnx(path: str, cfg: SemanticConfig):
    """Importer seam for the released RangeNet++ ONNX weights
    (reference downloads darknet53.onnx; netTensorRT.cpp:491-676 builds the
    engine from it). Maps ONNX initializer tensors onto the Flax parameter
    tree by layer order. Requires the `onnx` package, which is not available
    in this environment — the function exists so the import path is ready
    when weights + onnx are."""
    try:
        import onnx  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "onnx is not installed in this environment; use the synthetic "
            "checkpoint (semantic/weights.py:DEFAULT_CHECKPOINT) instead"
        ) from e
    raise NotImplementedError("ONNX import mapping pending released weights")
