"""Semantic fusion: RangeNet inference -> per-point labels -> category
clouds + matching weights.

Rebuild of:
 - `RangenetAPI::infer` (reference src/core/rangenetAPI.cpp:17-127):
   per-point argmax over 20 classes, label/RGB clouds,
 - `SemanticFusionNode::{laserCloudInfoHandler, categoryMapping}`
   (src/node/semanticFusionNode.cpp:139-254): 20 learning classes -> 5
   super-category clouds {dynamic, ground, building, pole, outlier} via
   UsingLableMap, assembled into the semantic_info state,
 - the semantic matching weights w = 2 - LabelSorce[label]
   (subMapOptmizationNode.cpp:1671,1795) consumed by the solver.

Everything operates on the (N_SCAN, H) projected grid so labels land on
exactly the points the SLAM step uses — no unproject/reproject roundtrip
(the reference's unprojection netTensorRT.cpp:404-428 exists only because
its net ran in a separate process).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import labels as L
from ..config import SemanticConfig
from ..models import rangenet


class SemanticImage(NamedTuple):
    labels: jnp.ndarray  # (N, H) int32 learning-class id (argmax)
    category: jnp.ndarray  # (N, H) int32 dense category index 0..4, -1 invalid
    weight: jnp.ndarray  # (N, H) float32 residual weight w = 2 - score
    probs_max: jnp.ndarray  # (N, H) max softmax prob (confidence)


def infer_labels(model, variables, rng_img, xyz_img, intensity_img, mask,
                 cfg: SemanticConfig) -> SemanticImage:
    """Run the net on the projected scan and derive label/weight images.

    The OS-32 encoder needs the width divisible by 32 (RangeNet++ trains at
    2048); arbitrary scan widths (e.g. 1800) are zero-padded and cropped.
    """
    img = rangenet.build_input_image(rng_img, xyz_img, intensity_img, mask, cfg)
    w = img.shape[1]
    pad = (-w) % 32
    if pad:
        img = jnp.pad(img, ((0, 0), (0, pad), (0, 0)))
    logits = model.apply(variables, img[None], train=False)[0]
    if pad:
        logits = logits[:, :w]
    probs = jnp.asarray(logits, jnp.float32)
    lab = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    pmax = jnp.max(jnp.asarray(jnp.exp(probs - jnp.max(probs, -1, keepdims=True)) /
                               jnp.sum(jnp.exp(probs - jnp.max(probs, -1, keepdims=True)), -1,
                                       keepdims=True), jnp.float32), axis=-1)
    lab = jnp.where(mask, lab, 0)
    return label_images(lab, mask, pmax)


def label_images(lab: jnp.ndarray, mask: jnp.ndarray,
                 pmax: jnp.ndarray | None = None) -> SemanticImage:
    """Derive category / weight images from a label image (also used with
    ground-truth labels in tests and the synthetic pipeline)."""
    cat_lut = jnp.asarray(L.LEARNING_TO_CATEGORY)
    w_lut = jnp.asarray(L.RESIDUAL_WEIGHT)
    cat = jnp.take(cat_lut, lab)
    w = jnp.take(w_lut, lab)
    cat = jnp.where(mask, cat, -1)
    w = jnp.where(mask, w, 1.0)
    if pmax is None:
        pmax = jnp.where(mask, 1.0, 0.0)
    return SemanticImage(labels=lab, category=cat, weight=w, probs_max=pmax)


def category_mask(sem: SemanticImage, category_index: int) -> jnp.ndarray:
    """Boolean (N, H) mask of one super-category (categoryMapping)."""
    return sem.category == category_index


def labels_to_rgb(lab: np.ndarray) -> np.ndarray:
    """Learning-class ids -> RGB uint8 (Argmax2RGB, rangenetAPI.cpp:75-127)."""
    return L.LEARNING_RGB[np.clip(lab, 0, L.NUM_LEARNING_CLASSES - 1)]


def dynamic_mask(sem: SemanticImage) -> jnp.ndarray:
    """Points in the dynamic super-class (candidates for map-based removal,
    subMap.h:1065-1100)."""
    dyn_idx = int(np.where(L.CATEGORY_IDS == L.CAT_DYNAMIC)[0][0])
    return sem.category == dyn_idx
