#!/usr/bin/env python
"""Benchmark the FULL-SIZE released darknet53 RangeNet++ architecture
(blocks 1,2,8,8,4 / widths 64..1024, arch_cfg of the released model) at the
reference's operating point: 64 x 2048 x 5 spherical image, batch 1
(netTensorRT.cpp:309-440, net.cpp:89-91, fp16 off there; bf16 on here via
cfg.semantic.fp16). Random-initialized weights measure the same compute as
the released checkpoint (zero egress blocks the weights, not the FLOPs).

Usage: python scripts/bench_darknet53.py [--cpu] [--fp32]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

from lis_slam_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax.numpy as jnp

from lis_slam_tpu.config import SlamConfig
from lis_slam_tpu.models import rangenet


def main():
    base = SlamConfig()
    sem = dataclasses.replace(
        base.semantic, enabled=True, fp16="--fp32" not in sys.argv)
    model = rangenet.create_model(sem)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, sem.model_input_h, sem.model_input_w,
                     sem.model_input_c), jnp.float32)
    t0 = time.perf_counter()
    variables = model.init(rng, img, train=False)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"params: {n_params / 1e6:.1f} M  (init {time.perf_counter() - t0:.1f}s)")

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    out = fwd(variables, img)
    jax.device_get(out[0, 0, 0])  # sync (block_until_ready unreliable on axon)
    print("logits:", out.shape, out.dtype)

    n = 20
    t0 = time.perf_counter()
    for k in range(n):
        # vary the input: the tunnel relay serves repeated identical
        # executions from a cache, which fakes the timing
        out = fwd(variables, img + jnp.float32(1 + k) * 1e-3)
    jax.device_get(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / n
    print(f"darknet53 64x2048x5 batch-1: {dt * 1e3:.2f} ms/inference "
          f"({1 / dt:.1f}/s) on {jax.devices()[0]}")


if __name__ == "__main__":
    main()
