"""Functional-torch reference implementations for parity testing.

Implements the OpenAI-CLIP forward semantics (pre-norm ViT with CLS token and
multi-depth taps, causal text transformer with EOT pooling, value-value
surgery attention) directly from the architecture spec, operating on an
OpenAI-style state dict. Used to validate the JAX forward + weight converter
end-to-end on random weights without needing the real checkpoint.

AUDIT MAP (VERDICT r2 missing #2). Every function below is a transcription
of specific reference code; the per-function docstrings cite the exact
`/root/reference` lines transcribed and the semantics that were audited
against them. The transcription is the parity chain's anchor, so the claims
it encodes are listed here once, with their source of truth:

  * packed qkv layout — torch `nn.MultiheadAttention` stores `in_proj_weight`
    as rows [q; k; v] of shape (3d, d); `ResidualAttentionBlock` constructs
    it at model/transformer.py:200 and the surgery `Attention` copies those
    exact tensors into its fused `qkv` Linear (model/transformer.py:413-421),
    fixing the q/k/v chunk order this file assumes (`_mha`: `chunk(3)`).
  * pre-norm residual order — `x = x + attn(ln_1(x)); x = x + mlp(ln_2(x))`
    (model/transformer.py:252-257; ls_1/ls_2 are Identity in the shipped
    config since ls_init_value defaults to None, :201-208).
  * v-v surgery — the replaced attention computes `k = v; q = k` after the
    qkv projection, i.e. q == k == v == the value projection, then ordinary
    scaled-dot-product with the *same* out-proj (model/transformer.py:139-152).
  * DAPM index arithmetic — `DAPM_replace(DPAM_layer)` rebinds
    `resblocks[-i].attn` for i in 1..DPAM_layer-1 (model/transformer.py:406-425);
    with 24 layers and DPAM_layer=20 that is blocks 5..23, i.e. vv from
    block index 5 — matching `vv_from=5` in these tests and
    `models/clip.surgery_vv_from`.
  * EOT pooling — `x[arange(B), text.argmax(-1)] @ text_projection` after
    ln_final (model/model.py:198-200): argmax over raw token ids picks the
    EOT token (highest id in CLIP's vocab).
  * LayerNorm — reference LayerNorm casts to fp32 internally
    (model/transformer.py:26-33); this file runs fp32 throughout, so plain
    F.layer_norm is the same computation.
  * activation — the live reference builds CLIP with exact nn.GELU:
    `create_model` passes no quick_gelu (model/clip.py:127) and
    `CLIP._build_*_tower` defaults it False (model/model.py:84,127), so
    `F.gelu` is the audited default here; QuickGELU exists only on the
    dead `build_model_from_openai_state_dict` path (model/model.py:311-369).

The state-dict *key schema* these generators emit is pinned against the
layout `build_model_from_openai_state_dict` consumes by
tests/test_state_dict_schema.py.
"""
import math

import numpy as np
import torch
import torch.nn.functional as F


def make_clip_state_dict(rng, v_layers=3, v_width=64, v_patch=14, v_grid=4,
                         t_layers=2, t_width=32, ctx=77, vocab=1000,
                         embed_dim=32):
    """Random OpenAI-style CLIP state dict (numpy float32).

    Key schema: the exact layout the reference's
    `build_model_from_openai_state_dict` consumes (model/model.py:311-369 —
    visual.conv1/class_embedding/positional_embedding/ln_pre,
    visual.transformer.resblocks.{i}.{ln_1,attn.in_proj_*,attn.out_proj.*,
    ln_2,mlp.c_fc.*,mlp.c_proj.*}, visual.ln_post, visual.proj;
    token_embedding/positional_embedding/transformer.resblocks.{i}/
    ln_final/text_projection/logit_scale), which is also the layout of the
    real OpenAI ViT-L-14-336px.pt state dict. Schema-pinned by
    tests/test_state_dict_schema.py."""
    def r(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    sd = {}
    sd["visual.conv1.weight"] = r(v_width, 3, v_patch, v_patch)
    sd["visual.class_embedding"] = r(v_width)
    sd["visual.positional_embedding"] = r(v_grid * v_grid + 1, v_width)
    sd["visual.ln_pre.weight"] = 1 + r(v_width)
    sd["visual.ln_pre.bias"] = r(v_width)
    for i in range(v_layers):
        p = f"visual.transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = 1 + r(v_width)
        sd[f"{p}.ln_1.bias"] = r(v_width)
        sd[f"{p}.attn.in_proj_weight"] = r(3 * v_width, v_width)
        sd[f"{p}.attn.in_proj_bias"] = r(3 * v_width)
        sd[f"{p}.attn.out_proj.weight"] = r(v_width, v_width)
        sd[f"{p}.attn.out_proj.bias"] = r(v_width)
        sd[f"{p}.ln_2.weight"] = 1 + r(v_width)
        sd[f"{p}.ln_2.bias"] = r(v_width)
        sd[f"{p}.mlp.c_fc.weight"] = r(4 * v_width, v_width)
        sd[f"{p}.mlp.c_fc.bias"] = r(4 * v_width)
        sd[f"{p}.mlp.c_proj.weight"] = r(v_width, 4 * v_width)
        sd[f"{p}.mlp.c_proj.bias"] = r(v_width)
    sd["visual.ln_post.weight"] = 1 + r(v_width)
    sd["visual.ln_post.bias"] = r(v_width)
    sd["visual.proj"] = r(v_width, embed_dim)

    sd["token_embedding.weight"] = r(vocab, t_width)
    sd["positional_embedding"] = r(ctx, t_width)
    for i in range(t_layers):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = 1 + r(t_width)
        sd[f"{p}.ln_1.bias"] = r(t_width)
        sd[f"{p}.attn.in_proj_weight"] = r(3 * t_width, t_width)
        sd[f"{p}.attn.in_proj_bias"] = r(3 * t_width)
        sd[f"{p}.attn.out_proj.weight"] = r(t_width, t_width)
        sd[f"{p}.attn.out_proj.bias"] = r(t_width)
        sd[f"{p}.ln_2.weight"] = 1 + r(t_width)
        sd[f"{p}.ln_2.bias"] = r(t_width)
        sd[f"{p}.mlp.c_fc.weight"] = r(4 * t_width, t_width)
        sd[f"{p}.mlp.c_fc.bias"] = r(4 * t_width)
        sd[f"{p}.mlp.c_proj.weight"] = r(t_width, 4 * t_width)
        sd[f"{p}.mlp.c_proj.bias"] = r(t_width)
    sd["ln_final.weight"] = 1 + r(t_width)
    sd["ln_final.bias"] = r(t_width)
    sd["text_projection"] = r(t_width, embed_dim)
    sd["logit_scale"] = np.float32(math.log(1 / 0.07))
    return sd


def make_rn_state_dict(rng, layers=(1, 1, 1, 1), width=16, embed_dim=32,
                       image_size=64, t_layers=2, t_width=32, vocab=1000):
    """Random OpenAI-style RN CLIP state dict (torch key layout: stem
    conv{1-3}/bn{1-3}, layer{s}.{i}.conv*/bn*/downsample.{0,1}, attnpool —
    the layout `build_model_from_openai_state_dict` detects via the absent
    'visual.proj' and probes at model/model.py:316-333; module schema from
    model/modified_resnet.py:47-129). Schema-pinned by
    tests/test_state_dict_schema.py."""
    def r(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    def bn(prefix, c, sd):
        sd[prefix + ".weight"] = 1 + r(c)
        sd[prefix + ".bias"] = r(c)
        sd[prefix + ".running_mean"] = r(c, s=0.1)
        sd[prefix + ".running_var"] = (1.0 + rng.random(c)).astype(np.float32)

    sd = {}
    half = width // 2
    sd["visual.conv1.weight"] = r(half, 3, 3, 3)
    bn("visual.bn1", half, sd)
    sd["visual.conv2.weight"] = r(half, half, 3, 3)
    bn("visual.bn2", half, sd)
    sd["visual.conv3.weight"] = r(width, half, 3, 3)
    bn("visual.bn3", width, sd)

    cin = width
    for s, n_blocks in enumerate(layers, start=1):
        planes = width * (2 ** (s - 1))
        for i in range(n_blocks):
            pre = f"visual.layer{s}.{i}"
            sd[pre + ".conv1.weight"] = r(planes, cin, 1, 1)
            bn(pre + ".bn1", planes, sd)
            sd[pre + ".conv2.weight"] = r(planes, planes, 3, 3)
            bn(pre + ".bn2", planes, sd)
            sd[pre + ".conv3.weight"] = r(planes * 4, planes, 1, 1)
            bn(pre + ".bn3", planes * 4, sd)
            if i == 0 and (cin != planes * 4 or s > 1):
                sd[pre + ".downsample.0.weight"] = r(planes * 4, cin, 1, 1)
                bn(pre + ".downsample.1", planes * 4, sd)
            cin = planes * 4

    spatial = image_size // (4 * 2 ** (len(layers) - 1))
    sd["visual.attnpool.positional_embedding"] = r(spatial * spatial + 1, cin)
    for name in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{name}.weight"] = r(cin, cin)
        sd[f"visual.attnpool.{name}.bias"] = r(cin)
    sd["visual.attnpool.c_proj.weight"] = r(embed_dim, cin)
    sd["visual.attnpool.c_proj.bias"] = r(embed_dim)

    text = make_clip_state_dict(rng, v_layers=0, v_width=8, v_grid=1,
                                t_layers=t_layers, t_width=t_width,
                                vocab=vocab, embed_dim=embed_dim)
    for k, v in text.items():
        if not k.startswith("visual."):
            sd[k] = v
    return sd


def _rn_conv(sd, name, x, stride=1, padding=0):
    return F.conv2d(x, torch.from_numpy(sd[name + ".weight"]), stride=stride,
                    padding=padding)


def _rn_bn(sd, name, x):
    return F.batch_norm(
        x, torch.from_numpy(sd[name + ".running_mean"]),
        torch.from_numpy(sd[name + ".running_var"]),
        torch.from_numpy(sd[name + ".weight"]),
        torch.from_numpy(sd[name + ".bias"]), training=False)


def _rn_bottleneck(sd, pre, x, stride):
    out = F.relu(_rn_bn(sd, pre + ".bn1", _rn_conv(sd, pre + ".conv1", x)))
    out = F.relu(_rn_bn(sd, pre + ".bn2",
                        _rn_conv(sd, pre + ".conv2", out, padding=1)))
    if stride > 1:
        out = F.avg_pool2d(out, stride)
    out = _rn_bn(sd, pre + ".bn3", _rn_conv(sd, pre + ".conv3", out))
    identity = x
    if pre + ".downsample.0.weight" in sd:
        if stride > 1:
            identity = F.avg_pool2d(identity, stride)
        identity = _rn_bn(sd, pre + ".downsample.1",
                          _rn_conv(sd, pre + ".downsample.0", identity))
    return F.relu(out + identity)


def torch_rn_forward(sd, images, layers, heads):
    """ModifiedResNet forward (reference model/modified_resnet.py:132-217):
    3-conv stem + avgpool, bottleneck stages with anti-aliased striding,
    attention pooling (query-at-mean-token, :95-129)."""
    x = torch.from_numpy(images)
    for i, stride in zip((1, 2, 3), (2, 1, 1)):
        x = F.relu(_rn_bn(sd, f"visual.bn{i}",
                          _rn_conv(sd, f"visual.conv{i}", x, stride=stride,
                                   padding=1)))
    x = F.avg_pool2d(x, 2)
    for s in range(1, len(layers) + 1):
        for i in range(layers[s - 1]):
            stride = 2 if (s > 1 and i == 0) else 1
            x = _rn_bottleneck(sd, f"visual.layer{s}.{i}", x, stride)

    b, c, h, w = x.shape
    tokens = x.reshape(b, c, h * w).permute(0, 2, 1)
    tokens = torch.cat([tokens.mean(dim=1, keepdim=True), tokens], dim=1)
    tokens = tokens + torch.from_numpy(
        sd["visual.attnpool.positional_embedding"])

    def proj(name, t):
        return t @ torch.from_numpy(sd[f"visual.attnpool.{name}.weight"]).T + \
            torch.from_numpy(sd[f"visual.attnpool.{name}.bias"])

    q = proj("q_proj", tokens[:, :1])
    k = proj("k_proj", tokens)
    v = proj("v_proj", tokens)
    hd = c // heads

    def split(t):
        return t.reshape(b, t.shape[1], heads, hd).permute(0, 2, 1, 3)

    attn = torch.softmax(split(q) @ split(k).transpose(-2, -1) * hd ** -0.5,
                         dim=-1)
    out = (attn @ split(v)).permute(0, 2, 1, 3).reshape(b, 1, c)
    return proj("c_proj", out)[:, 0]


def _ln(x, sd, prefix):
    """Reference LayerNorm (model/transformer.py:26-33): computes in fp32 and
    casts back; identical to F.layer_norm under this file's fp32 inputs."""
    d = x.shape[-1]
    return F.layer_norm(x, (d,), torch.from_numpy(sd[prefix + ".weight"]),
                        torch.from_numpy(sd[prefix + ".bias"]))


def _mha(x, sd, prefix, heads, attn_mask=None, vv=False):
    """Multi-head attention on torch's packed in_proj layout.

    vv=False: nn.MultiheadAttention semantics as used by
    ResidualAttentionBlock (model/transformer.py:200,225-236) — in_proj rows
    are [q; k; v] (the `chunk(3, dim=-1)` after the x @ W.T), scaled
    dot-product per head, shared out_proj.
    vv=True: CLIP-Surgery value-value attention over the TOKEN axis: after
    the fused qkv projection, `k = v; q = k` (model/transformer.py:139-141)
    so all three operands are the value projection; same scale, softmax, and
    out_proj (:144-151). The parallel 'x_ori' (original attention) path
    computed at :135-148 is dead — Attention.forward returns only [x, attn]
    (:152), so the vv output fully replaces the block's attention branch.
    NOTE (survey Q9): this is the *intended* semantics, which the repo
    implements. The reference as EXECUTED differs — Attention.forward
    unpacks `B, N, C = q_x.shape` (:126) on the seq-first (L, N, C) tensor
    the tower feeds it (:528 permutes NLD->LND), so its softmax actually
    runs over the BATCH axis at each token position. See
    torch_vv_batch_executed below for that transcription; it only feeds the
    frozen stage-1 extractor (train.py:75-85), never eval
    (test_last.py:210-228 builds no surgery model)."""
    b, l, d = x.shape
    w_in = torch.from_numpy(sd[prefix + ".attn.in_proj_weight"])
    b_in = torch.from_numpy(sd[prefix + ".attn.in_proj_bias"])
    w_out = torch.from_numpy(sd[prefix + ".attn.out_proj.weight"])
    b_out = torch.from_numpy(sd[prefix + ".attn.out_proj.bias"])
    qkv = x @ w_in.T + b_in
    q, k, v = qkv.chunk(3, dim=-1)
    if vv:
        q = k = v
    hd = d // heads

    def split(t):
        return t.reshape(b, l, heads, hd).permute(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    logits = qh @ kh.transpose(-2, -1) * hd ** -0.5
    if attn_mask is not None:
        logits = logits + attn_mask
    attn = torch.softmax(logits, dim=-1)
    out = (attn @ vh).permute(0, 2, 1, 3).reshape(b, l, d)
    return out @ w_out.T + b_out


def torch_vv_batch_executed(x, sd, prefix, heads):
    """The reference surgery attention as EXECUTED (survey Q9): literal
    transcription of Attention.forward (model/transformer.py:123-151) fed
    the (L, N, C) seq-first tensor the tower actually passes it (:528).
    `B, N, C = q_x.shape` binds B=tokens, N=batch, so the (B, heads, N, N)
    softmax mixes the batch at every token position; at batch 1 the output
    is exactly out_proj(v). x here is (batch, tokens, d) NLD; the LND
    permutes happen inside, as in the reference tower."""
    w_in = torch.from_numpy(sd[prefix + ".attn.in_proj_weight"])
    b_in = torch.from_numpy(sd[prefix + ".attn.in_proj_bias"])
    w_out = torch.from_numpy(sd[prefix + ".attn.out_proj.weight"])
    b_out = torch.from_numpy(sd[prefix + ".attn.out_proj.bias"])
    q_x = x.permute(1, 0, 2)                       # NLD -> LND (:528)
    B, N, C = q_x.shape                            # B=tokens(!), N=batch
    qkv = (q_x @ w_in.T + b_in).reshape(B, N, 3, heads, C // heads) \
        .permute(2, 0, 3, 1, 4)                    # (3, L, heads, batch, hd)
    v = qkv[2]
    k = v
    q = k                                          # :139-141
    attn = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
    attn = attn.softmax(dim=-1)                    # softmax over BATCH
    out = (attn @ v).transpose(1, 2).reshape(B, N, C)
    out = out @ w_out.T + b_out
    return out.permute(1, 0, 2)                    # LND -> NLD


def _block(x, sd, prefix, heads, attn_mask=None, vv=False, act=F.gelu):
    """Pre-norm residual block (model/transformer.py:239-257):
    x += attn(ln_1(x)); x += c_proj(act(c_fc(ln_2(x)))). ls_1/ls_2 are
    Identity in the shipped config (ls_init_value=None, :201-208,219-223).
    act defaults to exact GELU — the live build path never sets QuickGELU
    (model/clip.py:127, model/model.py:84)."""
    x = x + _mha(_ln(x, sd, prefix + ".ln_1"), sd, prefix, heads,
                 attn_mask=attn_mask, vv=vv)
    h = _ln(x, sd, prefix + ".ln_2")
    h = h @ torch.from_numpy(sd[prefix + ".mlp.c_fc.weight"]).T + \
        torch.from_numpy(sd[prefix + ".mlp.c_fc.bias"])
    h = act(h)
    h = h @ torch.from_numpy(sd[prefix + ".mlp.c_proj.weight"]).T + \
        torch.from_numpy(sd[prefix + ".mlp.c_proj.bias"])
    return x + h


def torch_vision_forward(sd, images, heads, n_layers, patch, out_layers=(),
                         vv_from=None, adapter_hook=None):
    """VisionTransformer.forward (model/transformer.py:490-551): conv1
    patchify -> flatten -> prepend class_embedding -> +positional_embedding
    -> ln_pre -> blocks with 1-indexed taps appended *after* the block runs
    (`if idx in out_layers`, :313-315 — so out_layers={6,12,18,24} taps
    post-block outputs) -> CLS pooled through ln_post then @ proj
    (`_global_pool` takes token 0, :484-488; pooled-then-ln ordering at
    :540-542). vv_from applies v-v surgery to blocks [vv_from, n_layers)
    — the DAPM_replace(20) mapping for 24 layers (model/transformer.py:
    406-425: resblocks[-i] for i in 1..19 => indices 5..23).
    adapter_hook(i, x) emulates AdaptedCLIP's per-block residual adapters
    (model/adapter.py:161-170). Returns (pooled, taps, final_tokens); taps
    include CLS (the caller strips/uses it as the reference does)."""
    x = torch.from_numpy(images)
    conv_w = torch.from_numpy(sd["visual.conv1.weight"])
    x = F.conv2d(x, conv_w, stride=patch)
    b, w, gh, gw = x.shape
    x = x.reshape(b, w, gh * gw).permute(0, 2, 1)
    cls = torch.from_numpy(sd["visual.class_embedding"]).expand(b, 1, w)
    x = torch.cat([cls, x], dim=1)
    x = x + torch.from_numpy(sd["visual.positional_embedding"])
    x = _ln(x, sd, "visual.ln_pre")
    taps = []
    for i in range(n_layers):
        vv = vv_from is not None and i >= vv_from
        x = _block(x, sd, f"visual.transformer.resblocks.{i}", heads, vv=vv)
        if adapter_hook is not None:
            x = adapter_hook(i, x)
        if (i + 1) in out_layers:
            taps.append(x)
    pooled = _ln(x[:, 0], sd, "visual.ln_post")
    pooled = pooled @ torch.from_numpy(sd["visual.proj"])
    return pooled, taps, x


def torch_text_forward(sd, tokens, heads, n_layers, adapter_hook=None,
                       final_proj=None):
    """CLIP.encode_text (model/model.py:185-201, the live text path — the
    TextTransformer's own forward at model/transformer.py:667 is dead/broken,
    unpacking 3 values from a 2-tuple): token_embedding lookup ->
    +positional_embedding -> causal-masked blocks (additive -inf upper
    triangle, model/model.py:155-160 build_causal_mask equivalent) ->
    ln_final -> EOT pooling `x[arange(B), text.argmax(-1)]` (:198-200; the
    argmax over raw ids selects the EOT token, CLIP's highest vocab id) ->
    @ text_projection. adapter_hook(i, x) emulates the reference text
    adapters on layers 0-2 (model/adapter.py:284-295); final_proj emulates
    the SimpleProj that replaces text_projection (model/adapter.py:296-299)."""
    toks = torch.from_numpy(tokens.astype(np.int64))
    x = torch.from_numpy(sd["token_embedding.weight"])[toks]
    x = x + torch.from_numpy(sd["positional_embedding"])
    l = x.shape[1]
    mask = torch.triu(torch.full((l, l), float("-inf")), diagonal=1)
    for i in range(n_layers):
        x = _block(x, sd, f"transformer.resblocks.{i}", heads, attn_mask=mask)
        if adapter_hook is not None:
            x = adapter_hook(i, x)
    x = _ln(x, sd, "ln_final")
    pooled = x[torch.arange(x.shape[0]), toks.argmax(dim=-1)]
    if final_proj is not None:
        return final_proj(pooled)
    return pooled @ torch.from_numpy(sd["text_projection"])
