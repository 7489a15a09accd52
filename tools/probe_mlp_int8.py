#!/usr/bin/env python
"""On-chip A/B probe: fused LN->MLP->residual kernel, bf16 weights vs int8
weights (ops/pallas_mlp.ln_mlp_residual vs ln_mlp_residual_int8), plus the
unfused XLA int8_linear chain, at the flagship ViT-L shape. Times a 24-deep
chain inside ONE jit, reports ms/chain and the int8 kernel's numeric error
vs the fp chain. Throwaway probe; results recorded in docs/DESIGN.md."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from aa_clip_iqm_tpu.ops import pallas_mlp as pm
from aa_clip_iqm_tpu.ops.layers import gelu, layer_norm, linear
from aa_clip_iqm_tpu.ops.quant import quantize_linear_params

LAYERS = 24
D, H = 1024, 4096
ROWS = 16 * 1408  # batch 16, prepadded 518px tower (1370 -> 1408 tokens)


def sync(x):
    np.asarray(jax.device_get(jnp.sum(x)))


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    ln = {"scale": jnp.asarray(rng.standard_normal(D) * 0.02 + 1,
                               jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32)}
    mlp = {"c_fc": {"w": jnp.asarray(rng.standard_normal((D, H)) * 0.03,
                                     jnp.float32),
                    "b": jnp.asarray(rng.standard_normal(H) * 0.02,
                                     jnp.float32)},
           "c_proj": {"w": jnp.asarray(rng.standard_normal((H, D)) * 0.02,
                                       jnp.float32),
                      "b": jnp.asarray(rng.standard_normal(D) * 0.02,
                                       jnp.float32)}}
    qmlp = {"c_fc": quantize_linear_params(mlp["c_fc"]),
            "c_proj": quantize_linear_params(mlp["c_proj"])}
    x = jnp.asarray(rng.standard_normal((ROWS, D)), jnp.bfloat16)
    assert pm.ln_mlp_residual_ok(x, mlp, gelu)
    assert pm.ln_mlp_residual_int8_ok(x, qmlp, gelu)

    @jax.jit
    def chain_fp(x):
        for _ in range(LAYERS):
            x = pm.ln_mlp_residual(ln, mlp, x, gelu)
        return x

    @jax.jit
    def chain_int8(x):
        for _ in range(LAYERS):
            x = pm.ln_mlp_residual_int8(ln, qmlp, x, gelu)
        return x

    @jax.jit
    def chain_int8_xla(x):
        # The unfused dispatch int8 path (ops.layers.linear on w_q params):
        # hidden tensor round-trips HBM between the two matmuls.
        for _ in range(LAYERS):
            h = gelu(linear(qmlp["c_fc"], layer_norm(ln, x)))
            x = x + linear(qmlp["c_proj"], h).astype(x.dtype)
        return x

    # numerics on one layer (fp32 reference)
    one_fp = np.asarray(pm.ln_mlp_residual(ln, mlp, x[:4096], gelu),
                        np.float32)
    one_q = np.asarray(pm.ln_mlp_residual_int8(ln, qmlp, x[:4096], gelu),
                       np.float32)
    rel = np.abs(one_q - one_fp).max() / (np.abs(one_fp).max() + 1e-9)
    print(f"int8 kernel 1-layer rel err vs fp kernel: {rel:.4f}")

    # FLOPs per chain: 2 matmuls/layer (quant epilogues not counted)
    flops = LAYERS * 2 * 2 * ROWS * D * H
    for name, fn in (("fused bf16", chain_fp), ("fused int8", chain_int8),
                     ("unfused int8 (XLA)", chain_int8_xla)):
        ms = timeit(fn, x)
        print(f"{name:>20}: {ms:8.2f} ms/chain  "
              f"{flops / (ms * 1e-3) / 1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
