#!/usr/bin/env python
"""On-chip A/B probe: fused LN->qkv->attention->out-proj->residual kernel
(ops/pallas_attn_block.py) vs the shipping chain (XLA LN/qkv/out-proj +
packed flash kernel). Times a 24-deep chain inside ONE jit. Throwaway
probe; results recorded in docs/DESIGN.md."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from aa_clip_iqm_tpu.ops import attention as attn_ops
from aa_clip_iqm_tpu.ops import pallas_attn_block as pb
from aa_clip_iqm_tpu.ops.layers import layer_norm

LAYERS = 24
HEADS, D = 16, 1024
VALID = 1370


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


def params(rng):
    ln = {"scale": jnp.asarray(rng.standard_normal(D) * 0.02 + 1,
                               jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32)}
    attn = {"qkv": {"w": jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.03,
                                     jnp.float32),
                    "b": jnp.zeros(3 * D, jnp.float32)},
            "out": {"w": jnp.asarray(rng.standard_normal((D, D)) * 0.03,
                                     jnp.float32),
                    "b": jnp.zeros(D, jnp.float32)}}
    return ln, attn


def main():
    rng = np.random.default_rng(0)
    ln, attn = params(rng)

    def chain_base(x, vv=False):
        def body(i, x):
            h = layer_norm(ln, x)
            if vv:
                a = attn_ops.vv_attention(attn, h, HEADS, use_pallas=True,
                                          valid_len=VALID)
            else:
                a = attn_ops.mha(attn, h, HEADS, use_pallas=True,
                                 valid_len=VALID)
            return x + a
        return jax.lax.fori_loop(0, LAYERS, body, x)

    def chain_fused(x, vv=False):
        def body(i, x):
            return pb.ln_attn_residual(ln, attn, x, HEADS, vv, VALID)
        return jax.lax.fori_loop(0, LAYERS, body, x)

    for b in (16, 6):
        x = jnp.asarray(rng.standard_normal((b, 1408, D)) * 0.5,
                        jnp.bfloat16)
        for vv in (False, True):
            fb = jax.jit(lambda t, vv=vv: chain_base(t, vv))
            ff = jax.jit(lambda t, vv=vv: chain_fused(t, vv))
            out_b = np.asarray(fb(x), np.float32)[:, :VALID]
            out_f = np.asarray(ff(x), np.float32)[:, :VALID]
            rel = np.max(np.abs(out_f - out_b)) / (np.max(np.abs(out_b)) + 1e-9)
            ms_b = timeit(fb, x)
            ms_f = timeit(ff, x)
            print(f"b{b} vv={vv}: base {ms_b / LAYERS:.3f} ms/layer, fused "
                  f"{ms_f / LAYERS:.3f} ms/layer "
                  f"[{100 * (ms_b - ms_f) / ms_b:+.1f}%] relerr={rel:.2e}",
                  flush=True)
            fb.clear_cache(); ff.clear_cache()


if __name__ == "__main__":
    main()
