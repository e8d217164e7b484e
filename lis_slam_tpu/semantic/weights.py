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


def expected_layer_sequence(cfg: SemanticConfig):
    """Graph-topological-order list of (param_path, kind) for the RangeNet
    architecture `cfg`, where kind is 'conv' (HWIO kernel, no bias),
    'deconv' (ConvTranspose), 'bn' (scale/bias/mean/var), or 'convb' (the
    class head, with bias). This IS the layer-order contract an ONNX
    initializer stream must be zipped against (the released darknet53.onnx
    serializes conv + BN initializers in the same topological order,
    netTensorRT.cpp:491-676 consumes them likewise)."""
    seq = []
    enc = "Darknet53Encoder_0"

    def cbl(prefix):
        seq.append((f"{prefix}/Conv_0", "conv"))
        seq.append((f"{prefix}/BatchNorm_0", "bn"))

    cbl(f"{enc}/ConvBnLeaky_0")  # stem
    rb = 0
    for i, nb in enumerate(cfg.enc_blocks):
        cbl(f"{enc}/ConvBnLeaky_{i + 1}")  # stride-2 downsample
        for _ in range(nb):
            cbl(f"{enc}/ResidualBlock_{rb}/ConvBnLeaky_0")
            cbl(f"{enc}/ResidualBlock_{rb}/ConvBnLeaky_1")
            rb += 1
    # decoder: skips are captured BEFORE each downsample, so their channel
    # counts are [stem=32, widths[0..-2]] and are consumed in reverse
    skip_ch = [32] + list(cfg.enc_widths[:-1])
    for i, feats in enumerate(cfg.dec_widths):
        up = f"UpBlock_{i}"
        seq.append((f"{up}/ConvTranspose_0", "deconv"))
        seq.append((f"{up}/BatchNorm_0", "bn"))
        cbl(f"{up}/ConvBnLeaky_0")
        if skip_ch[len(skip_ch) - 1 - i] != feats:
            seq.append((f"{up}/Conv_0", "conv"))  # 1x1 skip projection
    seq.append(("Conv_0", "convb"))  # class head (bias, float32)
    return seq


def map_ordered_weights(entries, cfg: SemanticConfig):
    """Map an ordered ONNX-style weight stream onto the Flax variables tree.

    `entries`: list of dicts in graph order, each one of
      {'kind': 'conv',   'w': (O, I, kH, kW)}
      {'kind': 'deconv', 'w': (I, O, kH, kW)}          (ONNX ConvTranspose)
      {'kind': 'convb',  'w': (O, I, kH, kW), 'b': (O,)}
      {'kind': 'bn',     'scale': g, 'bias': b, 'mean': m, 'var': v}
    Returns flax `variables` = {'params': ..., 'batch_stats': ...}.

    This is the environment-independent half of the ONNX importer: the
    layer-order mapping + layout conversion (OIHW -> HWIO, ONNX deconv
    IOHW -> flax HWIO), unit-tested against a synthetic stream generated
    from the model's own init (tests/test_semantic_infer.py). `load_onnx`
    merely extracts this stream from a .onnx file."""
    seq = expected_layer_sequence(cfg)
    if len(entries) != len(seq):
        raise ValueError(
            f"weight stream has {len(entries)} layer groups, architecture "
            f"expects {len(seq)} — architecture/config mismatch")
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf, value):
        node = tree
        for p in path.split("/"):
            node = node.setdefault(p, {})
        node[leaf] = np.asarray(value)

    for (path, kind), e in zip(seq, entries):
        if e["kind"] != kind:
            raise ValueError(f"at {path}: expected {kind}, got {e['kind']}")
        if kind in ("conv", "convb"):
            w = np.transpose(np.asarray(e["w"]), (2, 3, 1, 0))  # OIHW->HWIO
            put(params, path, "kernel", w)
            if kind == "convb":
                put(params, path, "bias", np.asarray(e["b"]))
        elif kind == "deconv":
            # ONNX ConvTranspose stores (I, O, kH, kW); flax wants
            # (kH, kW, I, O)
            w = np.transpose(np.asarray(e["w"]), (2, 3, 0, 1))
            put(params, path, "kernel", w)
        else:  # bn
            put(params, path, "scale", np.asarray(e["scale"]))
            put(params, path, "bias", np.asarray(e["bias"]))
            put(stats, path, "mean", np.asarray(e["mean"]))
            put(stats, path, "var", np.asarray(e["var"]))
    return {"params": params, "batch_stats": stats}


def load_onnx(path: str, cfg: SemanticConfig):
    """Importer for the released RangeNet++ ONNX weights (the reference
    downloads darknet53.onnx; netTensorRT.cpp:491-676 builds a TensorRT
    engine from it). Extracts the conv/BN initializer stream in graph order
    and maps it via `map_ordered_weights` (which carries all the logic and
    is unit-tested offline). Requires the `onnx` package — unavailable in
    this environment (zero egress), so only this thin extraction shim stays
    gated."""
    try:
        import onnx
    except ImportError as e:
        raise NotImplementedError(
            "onnx is not installed in this environment; use the synthetic "
            "checkpoint (semantic/weights.py:DEFAULT_CHECKPOINT) instead"
        ) from e
    model = onnx.load(path)
    init = {t.name: onnx.numpy_helper.to_array(t)
            for t in model.graph.initializer}
    entries = []
    nodes = list(model.graph.node)
    for i, node in enumerate(nodes):
        if node.op_type == "Conv":
            w = init[node.input[1]]
            if len(node.input) > 2:  # biased conv = the class head
                entries.append({"kind": "convb", "w": w,
                                "b": init[node.input[2]]})
            else:
                entries.append({"kind": "conv", "w": w})
        elif node.op_type == "ConvTranspose":
            entries.append({"kind": "deconv", "w": init[node.input[1]]})
        elif node.op_type == "BatchNormalization":
            entries.append({
                "kind": "bn",
                "scale": init[node.input[1]], "bias": init[node.input[2]],
                "mean": init[node.input[3]], "var": init[node.input[4]],
            })
    return map_ordered_weights(entries, cfg)
