"""Blockwise (flash-style) fused attention as a Pallas TPU kernel.

Why: at 518px the ViT runs 24 attention layers over 1370 tokens. The naive
path materializes the (L, L) probability tensor in HBM per head per layer —
at batch 16 that is ~1.9 GB of HBM traffic per layer each way, which is the
bandwidth bottleneck of the whole model. This kernel keeps the running
softmax statistics in VMEM (online softmax) and never writes the L x L
matrix, so attention becomes MXU-bound.

Design:
  - grid (batch*heads, Lq/BLK_Q); K/V for one head live fully in VMEM
    (1408 x 64 fp32 = 350 KB — fits easily in 16 MB VMEM).
  - fp32 accumulation; logits computed with preferred_element_type=fp32;
    probabilities cast to the value dtype for the p @ v MXU matmul.
  - sequence padded to a multiple of the 128-lane tile; padded keys are
    masked with -inf inside the kernel, padded query rows are sliced off
    by the caller.
  - backward: custom_vjp that recomputes attention with XLA ops (training
    batches here are tiny — reference uses batch 2 — so the recomputed
    (L, L) tensor is cheap; inference never takes this path).

Supports the v-v "surgery" variant trivially (pass v as q and k).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK_Q = 128
LANE = 128

# Interpreter-mode switch for CPU tests (pallas interprets the same kernel
# that Mosaic compiles on TPU).
INTERPRET = False


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int,
                  blk_k: int, n_k: int):
    q = q_ref[0].astype(jnp.float32) * scale              # (BLK_Q, hd)
    hd = q.shape[-1]
    m_i = jnp.full((BLK_Q, 1), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((BLK_Q, 1), jnp.float32)
    acc = jnp.zeros((BLK_Q, hd), jnp.float32)

    for kb in range(n_k):
        k_blk = k_ref[0, kb * blk_k:(kb + 1) * blk_k, :]  # (blk_k, hd)
        v_blk = v_ref[0, kb * blk_k:(kb + 1) * blk_k, :]
        s = jax.lax.dot_general(
            q, k_blk.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (BLK_Q, blk_k)
        if (kb + 1) * blk_k > seq_len:  # static: boundary/pad chunks only
            s = s + _mask_bias(blk_k, seq_len, offset=kb * blk_k)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_i = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_i = m_new

    o_ref[0] = (acc / l_i).astype(o_ref.dtype)


def _mask_bias(n_cols: int, seq_len: int, offset: int = 0):
    """(1, n_cols) additive bias: 0 for real keys, -inf for padded ones.

    Folding the pad mask into one broadcast add is ~2 full VPU passes
    cheaper than the iota/compare/select triple over the (blk_q, L) score
    row the naive mask costs."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1) + offset
    return jnp.where(col < seq_len, 0.0, -jnp.inf).astype(jnp.float32)


def _row_kernel_grouped(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        seq_len: int, heads_per_block: int):
    """Whole-row attention over a panel of `heads_per_block` heads.

    Mosaic requires the trailing block dimension to be a multiple of 128;
    with hd=64 (CLIP ViT-L) we therefore slice 128-column panels (2 heads)
    out of the packed qkv array and attend each head's half inside the
    kernel. Refs: (1, BLK_Q, G*hd) / (1, L_pad, G*hd)."""
    g = heads_per_block
    hd = q_ref.shape[-1] // g
    l_pad = k_ref.shape[1]
    bias = _mask_bias(l_pad, seq_len) if seq_len < l_pad else None
    for i in range(g):
        sl = slice(i * hd, (i + 1) * hd)
        q = q_ref[0, :, sl].astype(jnp.float32) * scale
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            s = s + bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)


def _row_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int):
    """Whole-row variant: the full (BLK_Q, L) score row lives in VMEM, so the
    softmax is a single masked pass (no online rescaling). Preferred while
    K/V + the row fit in VMEM (true up to ~8k tokens at hd=64); the blockwise
    online-softmax kernel below covers longer sequences."""
    q = q_ref[0].astype(jnp.float32) * scale                  # (BLK_Q, hd)
    k = k_ref[0]                                              # (L_pad, hd)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # (BLK_Q, L_pad)
    if seq_len < k.shape[0]:
        s = s + _mask_bias(k.shape[0], seq_len)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (acc / l).astype(o_ref.dtype)


# Above this many padded tokens the (BLK_Q, L) row + K/V no longer fit VMEM
# comfortably; switch to the online-softmax blockwise kernel.
ROW_KERNEL_MAX_TOKENS = 8192


def _flash_forward(q, k, v, scale: float):
    """q, k, v: (BH, L, hd) -> (BH, L, hd)."""
    bh, seq_len, hd = q.shape
    l_pad = _round_up(seq_len, BLK_Q)
    blk_k = LANE
    n_k = l_pad // blk_k

    def pad(x):
        if x.shape[1] == l_pad:
            return x
        return jnp.pad(x, ((0, 0), (0, l_pad - x.shape[1]), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    if l_pad <= ROW_KERNEL_MAX_TOKENS:
        kernel = functools.partial(_row_kernel, scale=scale, seq_len=seq_len)
    else:
        kernel = functools.partial(_flash_kernel, scale=scale, seq_len=seq_len,
                                   blk_k=blk_k, n_k=n_k)
    out = pl.pallas_call(
        kernel,
        grid=(bh, l_pad // BLK_Q),
        in_specs=[
            pl.BlockSpec((1, BLK_Q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK_Q, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, l_pad, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l_pad * l_pad * hd,
            bytes_accessed=3 * bh * l_pad * hd * q.dtype.itemsize,
            transcendentals=bh * l_pad * l_pad,
        ),
        interpret=INTERPRET,
    )(qp, kp, vp)
    return out[:, :seq_len, :]


def _reference_sdpa(q, k, v, scale, mask=None):
    logits = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_bh(q, k, v, scale):
    return _flash_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    # Recompute-based backward with XLA ops (used only in small-batch
    # training; see module docstring).
    q, k, v = res

    def f(q, k, v):
        return _reference_sdpa(q, k, v, scale)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


_flash_attention_bh.defvjp(_fwd, _bwd)


# Packed-kernel tiling knobs (see flash_mha_packed): how many query rows one
# program handles and how many heads share a program's 128*k-column panel.
# Swept on v5e at ViT-L/518 (1370 tokens, 16 heads x 64): q-block ~704 rows /
# 2-head panels is fastest (4.15 ms/layer vs 4.93 at 128/2); larger head
# groups overflow VMEM. PACKED_BLK_Q=None picks the block adaptively.
PACKED_BLK_Q = None
PACKED_BLK_Q_TARGET = 704
PACKED_GROUP_HEADS = None  # None -> minimum legal (128 // head_dim)
_VMEM_SCORE_BYTES = 4 * 1024 * 1024  # budget for the (blk_q, L) fp32 row


def _choose_blk(seq_len: int, score_budget_bytes: int) -> int:
    """Divide the 128-aligned sequence into equal q-blocks near the swept
    optimum, capped so the fp32 score row fits the given VMEM budget.
    PACKED_BLK_Q (when set) pins the block for forward *and* backward."""
    if PACKED_BLK_Q is not None:
        return PACKED_BLK_Q
    l128 = _round_up(seq_len, 128)
    n_blocks = max(1, round(l128 / PACKED_BLK_Q_TARGET))
    blk = -(-l128 // n_blocks)          # ceil
    blk = _round_up(blk, 8)
    cap = max(128, (score_budget_bytes // (4 * l128)) // 8 * 8)
    return min(blk, cap)


def _choose_blk_q(seq_len: int) -> int:
    return _choose_blk(seq_len, _VMEM_SCORE_BYTES)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def flash_mha_packed(qkv, num_heads: int, scale: float, vv: bool = False,
                     valid_len=None):
    """Fused attention straight off the packed qkv projection.

    qkv: (B, L, 3W) — the output of the fused in-proj matmul, untouched.
    Returns (B, L, W), already in merged-head layout for the out-projection.

    The head split (B,L,W)->(B,H,L,hd) and merge transposes of the classic
    path are pure HBM traffic (~6 full activation copies per layer); here the
    kernel's BlockSpecs column-slice q/k/v head panels out of the packed
    array directly, so those copies never exist. ``vv`` points all three
    operands at the value columns (CLIP-Surgery value-value attention).
    """
    b, in_len, threew = qkv.shape
    w = threew // 3
    hd = w // num_heads
    blk_q = _choose_blk_q(in_len)
    l_pad = _round_up(in_len, blk_q)
    if l_pad != in_len:
        qkv = jnp.pad(qkv, ((0, 0), (0, l_pad - in_len), (0, 0)))
    # Number of real tokens: tokens beyond it (kernel padding, or the
    # caller's own tower-wide pre-padding) are masked out of the softmax.
    seq_len = valid_len if valid_len is not None else in_len

    # Mosaic wants trailing block dims in multiples of 128: group heads into
    # 128*k-column panels (minimum 2 heads at hd=64).
    min_group = max(1, LANE // hd)
    group = PACKED_GROUP_HEADS or min_group
    group = max(group, min_group)
    while num_heads % group:
        group -= 1
    if group < min_group:
        raise ValueError(
            f"num_heads={num_heads} has no legal head grouping for hd={hd}; "
            "gate calls with attention._packed_pallas_ok")
    panel = group * hd
    n_panels = num_heads // group
    q_sec, k_sec, v_sec = (2, 2, 2) if vv else (0, 1, 2)
    sec_panels = w // panel  # col-block index unit is `panel` columns

    kernel = functools.partial(_row_kernel_grouped, scale=scale,
                               seq_len=seq_len, heads_per_block=group)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_panels, l_pad // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, panel),
                         lambda bi, hi, j, s=q_sec: (bi, j, s * sec_panels + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, panel),
                         lambda bi, hi, j, s=k_sec: (bi, 0, s * sec_panels + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, panel),
                         lambda bi, hi, j, s=v_sec: (bi, 0, s * sec_panels + hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, panel),
                               lambda bi, hi, j: (bi, j, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, w), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * l_pad * l_pad * hd,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=b * num_heads * l_pad * l_pad,
        ),
        interpret=INTERPRET,
    )(qkv, qkv, qkv)
    # Give back exactly the caller's token length (pre-padded callers get
    # their padded length back, so the tower never re-slices per layer).
    return out[:, :in_len, :]


def _bwd_kernel_grouped(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                        dk_acc, dv_acc, *, scale: float, seq_len: int,
                        heads_per_block: int, n_j: int):
    """Flash backward for the packed row kernel (standard q/k/v path).

    Recomputes s and p for its q-block (no saved probabilities), then
      dv += p^T dO;  dp = dO v^T;  D = rowsum(p * dp);
      ds = p (dp - D);  dq = ds k * scale;  dk += ds^T q * scale.
    dk/dv accumulate across q-blocks (innermost grid dim) in fp32 VMEM
    *scratch* (bf16 += drifts); the outputs themselves are written once, in
    the input dtype, at the last q-block — so the caller's dq/dk/dv concat
    moves half the bytes an fp32 round-trip would and needs no cast.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    g = heads_per_block
    hd = q_ref.shape[-1] // g
    for i in range(g):
        sl = slice(i * hd, (i + 1) * hd)
        q = q_ref[0, :, sl].astype(jnp.float32) * scale   # (blk, hd)
        k = k_ref[0, :, sl]                                # (L, hd)
        v = v_ref[0, :, sl]
        dO = g_ref[0, :, sl].astype(jnp.float32)           # (blk, hd)

        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (blk, L)
        if seq_len < s.shape[1]:
            s = s + _mask_bias(s.shape[1], seq_len)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)          # (blk, L)

        pb = p.astype(v.dtype)
        dv_acc[:, sl] += jax.lax.dot_general(
            pb, dO.astype(v.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        dp = jax.lax.dot_general(
            dO.astype(v.dtype), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (blk, L)
        d_row = jnp.sum(p * dp, axis=1, keepdims=True)
        ds = p * (dp - d_row)                              # (blk, L)
        dsb = ds.astype(k.dtype)

        dq_ref[0, :, sl] = (jax.lax.dot_general(
            dsb, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        # q here already carries the scale factor: dL/dk = ds^T (q_raw*scale)
        dk_acc[:, sl] += jax.lax.dot_general(
            dsb, q.astype(k.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == n_j - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _vv_bwd_kernel_grouped(aq_ref, a_ref, g_ref, dv_ref, dv_acc, *,
                           scale: float, seq_len: int, heads_per_block: int,
                           n_j: int):
    """Flash backward for the v-v surgery path (q = k = v = A).

    out = softmax(scale * A A^T) A, so the gradient flows into A three ways:
      dA = p^T dO                      (value operand)
         + scale * ds   A             (query operand — rows of this q-block)
         + scale * ds^T A_j           (key operand — all rows)
    with ds = p * (dp - rowsum(p*dp)), dp = dO A^T, all recomputed per
    q-block.  All three terms accumulate into one fp32 VMEM scratch using the
    revisiting-output-block pattern; the query-operand term lands in the
    accumulator's own q-block rows via a dynamic row slice.  Reference
    semantics: model/transformer.py:102-152 (v-v Attention) — the reference
    never differentiates this path; we support it so the surgery tower is
    trainable (PARITY.md row 3).
    """
    j = pl.program_id(2)
    blk_q = aq_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        dv_acc[...] = jnp.zeros_like(dv_acc)

    g = heads_per_block
    hd = aq_ref.shape[-1] // g
    for i in range(g):
        sl = slice(i * hd, (i + 1) * hd)
        a_j = aq_ref[0, :, sl]                             # (blk, hd)
        a = a_ref[0, :, sl]                                # (L, hd)
        dO = g_ref[0, :, sl].astype(jnp.float32)           # (blk, hd)

        s = jax.lax.dot_general(
            a_j.astype(jnp.float32) * scale, a.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (blk, L)
        if seq_len < s.shape[1]:
            s = s + _mask_bias(s.shape[1], seq_len)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)          # (blk, L)

        pb = p.astype(a.dtype)
        dv_acc[:, sl] += jax.lax.dot_general(
            pb, dO.astype(a.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # value path

        dp = jax.lax.dot_general(
            dO.astype(a.dtype), a,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (blk, L)
        d_row = jnp.sum(p * dp, axis=1, keepdims=True)
        ds = p * (dp - d_row)
        dsb = ds.astype(a.dtype)

        dv_acc[pl.ds(j * blk_q, blk_q), sl] += jax.lax.dot_general(
            dsb, a, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # query path
        dv_acc[:, sl] += jax.lax.dot_general(
            dsb, a_j.astype(a.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # key path

    @pl.when(j == n_j - 1)
    def _flush():
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_packed_vv_bwd_kernelized(qkv, g, num_heads, scale, valid_len):
    """dqkv for the v-v packed attention via the Pallas backward: the q/k
    column gradients are identically zero (the forward never reads them), and
    the v columns get the three-way accumulated gradient."""
    b, in_len, threew = qkv.shape
    w = threew // 3
    hd = w // num_heads
    blk_q = _choose_bwd_blk_q(in_len)
    l_pad = _round_up(in_len, blk_q)
    if l_pad != in_len:
        qkv = jnp.pad(qkv, ((0, 0), (0, l_pad - in_len), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, l_pad - in_len), (0, 0)))
    seq_len = valid_len if valid_len is not None else in_len

    group = _bwd_group(num_heads, hd)
    panel = group * hd
    n_panels = num_heads // group
    sec_panels = w // panel

    n_j = l_pad // blk_q
    kernel = functools.partial(_vv_bwd_kernel_grouped, scale=scale,
                               seq_len=seq_len, heads_per_block=group,
                               n_j=n_j)
    dv = pl.pallas_call(
        kernel,
        grid=(b, n_panels, n_j),
        in_specs=[
            pl.BlockSpec((1, blk_q, panel),
                         lambda bi, hi, j: (bi, j, 2 * sec_panels + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, panel),
                         lambda bi, hi, j: (bi, 0, 2 * sec_panels + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, panel),
                         lambda bi, hi, j: (bi, j, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l_pad, panel), lambda bi, hi, j: (bi, 0, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, w), qkv.dtype),
        scratch_shapes=(pltpu.VMEM((l_pad, panel), jnp.float32),),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * num_heads * l_pad * l_pad * hd,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=b * num_heads * l_pad * l_pad,
        ),
        interpret=INTERPRET,
    )(qkv, qkv, g)
    zeros = jnp.zeros((b, in_len, 2 * w), qkv.dtype)
    return jnp.concatenate([zeros, dv[:, :in_len, :]], axis=-1)


# Separate (smaller) q-block budget for the backward kernel: it holds two
# (blk, L) fp32 rows (p and ds) plus the dk/dv accumulators in VMEM.
_BWD_VMEM_SCORE_BYTES = 2 * 1024 * 1024

# Head-panel width for the backward kernels. None -> minimum legal
# (128 // head_dim, i.e. 2 heads at hd=64). Wider panels shrink the grid
# but grow the per-program VMEM accumulators; swept on v5e at ViT-L/518 —
# see docs/DESIGN.md.
BWD_GROUP_HEADS = None


def _bwd_group(num_heads: int, hd: int) -> int:
    min_group = max(1, LANE // hd)
    group = BWD_GROUP_HEADS or min_group
    group = max(group, min_group)
    while num_heads % group:
        group -= 1
    return max(group, min_group)


def _choose_bwd_blk_q(seq_len: int) -> int:
    return _choose_blk(seq_len, _BWD_VMEM_SCORE_BYTES)


def _flash_packed_bwd_kernelized(qkv, g, num_heads, scale, valid_len):
    """dqkv for the standard packed attention via the Pallas backward."""
    b, in_len, threew = qkv.shape
    w = threew // 3
    hd = w // num_heads
    blk_q = _choose_bwd_blk_q(in_len)
    l_pad = _round_up(in_len, blk_q)
    if l_pad != in_len:
        qkv = jnp.pad(qkv, ((0, 0), (0, l_pad - in_len), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, l_pad - in_len), (0, 0)))
    seq_len = valid_len if valid_len is not None else in_len

    group = _bwd_group(num_heads, hd)
    panel = group * hd
    n_panels = num_heads // group
    sec_panels = w // panel

    n_j = l_pad // blk_q
    kernel = functools.partial(_bwd_kernel_grouped, scale=scale,
                               seq_len=seq_len, heads_per_block=group,
                               n_j=n_j)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, n_panels, n_j),
        in_specs=[
            pl.BlockSpec((1, blk_q, panel),
                         lambda bi, hi, j: (bi, j, 0 * sec_panels + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, panel),
                         lambda bi, hi, j: (bi, 0, 1 * sec_panels + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, panel),
                         lambda bi, hi, j: (bi, 0, 2 * sec_panels + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, panel),
                         lambda bi, hi, j: (bi, j, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, panel), lambda bi, hi, j: (bi, j, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, panel), lambda bi, hi, j: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, panel), lambda bi, hi, j: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l_pad, w), qkv.dtype),
            jax.ShapeDtypeStruct((b, l_pad, w), qkv.dtype),
            jax.ShapeDtypeStruct((b, l_pad, w), qkv.dtype),
        ),
        scratch_shapes=(
            pltpu.VMEM((l_pad, panel), jnp.float32),
            pltpu.VMEM((l_pad, panel), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * l_pad * l_pad * hd,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=b * num_heads * l_pad * l_pad,
        ),
        interpret=INTERPRET,
    )(qkv, qkv, qkv, g)
    # A custom VJP must hand back ONE dqkv tensor; the kernel emits dq/dk/dv
    # in the input dtype (fp32 accumulation stays in VMEM scratch), so this
    # concat is the only extra HBM round-trip and moves half the bytes the
    # previous fp32 concat+cast did.
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv[:, :in_len, :]


def _packed_reference(qkv, num_heads, scale, vv, valid_len=None):
    b, l, threew = qkv.shape
    w = threew // 3
    hd = w // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if vv:
        q = k = v

    def split(t):
        return t.reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)

    mask = None
    if valid_len is not None and valid_len < l:
        mask = jnp.where(jnp.arange(l) < valid_len, 0.0, -jnp.inf)[None, :]
    out = _reference_sdpa(
        split(q).reshape(b * num_heads, l, hd),
        split(k).reshape(b * num_heads, l, hd),
        split(v).reshape(b * num_heads, l, hd), scale, mask)
    return out.reshape(b, num_heads, l, hd).transpose(0, 2, 1, 3).reshape(b, l, w)


def _packed_fwd(qkv, num_heads, scale, vv, valid_len):
    return flash_mha_packed(qkv, num_heads, scale, vv, valid_len), qkv


# The v-v flash backward is on by default; the XLA-recompute VJP stays as the
# parity oracle (tests flip this off to compare) and as a debugging fallback.
VV_BWD_KERNEL = True


def _packed_bwd(num_heads, scale, vv, valid_len, qkv, g):
    if not vv:
        # Flash backward kernel: recomputes p per q-block, never
        # materializes the (L, L) probabilities in HBM.
        return (_flash_packed_bwd_kernelized(qkv, g, num_heads, scale,
                                             valid_len),)
    if VV_BWD_KERNEL:
        # v-v surgery path, kernelized: the three-way shared-operand chain
        # rule accumulates in one fp32 VMEM scratch (see _vv_bwd_kernel_grouped).
        return (_flash_packed_vv_bwd_kernelized(qkv, g, num_heads, scale,
                                                valid_len),)
    # XLA recompute fallback: materializes the (L, L) probabilities but
    # handles the shared-operand chain rule with autodiff.
    _, vjp = jax.vjp(
        lambda t: _packed_reference(t, num_heads, scale, vv, valid_len), qkv)
    return vjp(g)


flash_mha_packed.defvjp(_packed_fwd, _packed_bwd)


def flash_mha(q, k, v, scale: float, attn_mask=None):
    """(B, H, L, hd) fused attention. Falls back to the XLA path when an
    additive mask is supplied (the text tower's 77-token causal attention is
    not worth a kernel), for short sequences, or off-TPU (Mosaic kernels only
    compile on TPU; the interpreter flag overrides for tests)."""
    on_tpu = INTERPRET or jax.default_backend() == "tpu"
    if attn_mask is not None or q.shape[-2] < 2 * BLK_Q or not on_tpu:
        from .attention import sdpa

        return sdpa(q, k, v, scale, attn_mask)
    b, h, l, hd = q.shape
    out = _flash_attention_bh(
        q.reshape(b * h, l, hd), k.reshape(b * h, l, hd),
        v.reshape(b * h, l, hd), scale)
    return out.reshape(b, h, l, hd)
