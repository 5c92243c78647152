"""Pretrained-weight porting into the Flax backbones.

Parity target (reference, for cross-checking — original implementation):
  - the v68 model initializes from timm's `vit_base_patch32_384.npz`
    (AugReg JAX-format checkpoint) via timm `_load_weights`
    (D1/train/train_v68/vsc/.../backbones/sscd.py:142, config_v68.py:2);
  - SwinV2 initializes from a torch state_dict checkpoint
    (swinv2.py:649-655).

`port_vit_augreg_npz` maps the AugReg npz naming
(Transformer/encoderblock_N/..., embedding/kernel, cls, posembed) onto
`models.vit.VisionTransformer` parameters, including fused-QKV assembly and
positional-embedding interpolation when grid sizes differ.

`port_swinv2_torch_state_dict` maps a torch SwinV2 state_dict (key names of
the official Microsoft implementation, which the reference vendors) onto
`models.swinv2.SwinTransformerV2` parameters.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import numpy as np


def _interp_pos_embed(pos: np.ndarray, target_tokens: int) -> np.ndarray:
    """Bilinear-resize the patch grid of a [1, 1+P, C] positional embedding."""
    if pos.shape[1] == target_tokens:
        return pos
    cls_tok, grid = pos[:, :1], pos[:, 1:]
    src = int(np.sqrt(grid.shape[1]))
    dst = int(np.sqrt(target_tokens - 1))
    grid = grid.reshape(1, src, src, -1)
    grid = np.asarray(
        jax.image.resize(grid, (1, dst, dst, grid.shape[-1]), method="bilinear")
    )
    return np.concatenate([cls_tok, grid.reshape(1, dst * dst, -1)], axis=1)


def port_vit_augreg_npz(npz: Mapping[str, np.ndarray], params_template) -> Dict:
    """Fill a VitDescriptor/VisionTransformer params tree from an AugReg npz.

    Handles both bare-backbone templates ({'params': {...ViT...}}) and the
    descriptor wrapper ({'params': {'backbone': {...}, 'gem': ..., 'head': ...}}) —
    head/gem params (absent from the npz) keep their initialization.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params_template["params"])
    prefix = ("backbone",) if ("backbone", "cls_token") in flat or any(
        k[0] == "backbone" for k in flat
    ) else ()

    def get(name):
        return np.asarray(npz[name])

    out = dict(flat)

    def put(key, value):
        key = prefix + key
        if key not in out:
            raise KeyError(f"template missing {key}")
        if out[key].shape != value.shape:
            raise ValueError(f"{key}: npz {value.shape} != template {out[key].shape}")
        out[key] = value.astype(np.asarray(out[key]).dtype)

    put(("patch_embed", "kernel"), get("embedding/kernel"))
    put(("patch_embed", "bias"), get("embedding/bias"))
    put(("cls_token",), get("cls").reshape(out[prefix + ("cls_token",)].shape))
    pos = get("Transformer/posembed_input/pos_embedding")
    target = out[prefix + ("pos_embed",)].shape[1]
    put(("pos_embed",), _interp_pos_embed(pos, target))

    depth = 0
    while f"Transformer/encoderblock_{depth}/LayerNorm_0/scale" in npz:
        depth += 1
    for i in range(depth):
        b = f"Transformer/encoderblock_{i}"
        blk = (f"block{i}",)
        put(blk + ("norm1", "scale"), get(f"{b}/LayerNorm_0/scale"))
        put(blk + ("norm1", "bias"), get(f"{b}/LayerNorm_0/bias"))
        put(blk + ("norm2", "scale"), get(f"{b}/LayerNorm_2/scale"))
        put(blk + ("norm2", "bias"), get(f"{b}/LayerNorm_2/bias"))
        att = f"{b}/MultiHeadDotProductAttention_1"
        c = out[prefix + blk + ("attn", "qkv", "kernel")].shape[0]
        qkv_k = np.concatenate(
            [get(f"{att}/{n}/kernel").reshape(c, c) for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [get(f"{att}/{n}/bias").reshape(c) for n in ("query", "key", "value")]
        )
        put(blk + ("attn", "qkv", "kernel"), qkv_k)
        put(blk + ("attn", "qkv", "bias"), qkv_b)
        put(blk + ("attn", "proj", "kernel"), get(f"{att}/out/kernel").reshape(c, c))
        put(blk + ("attn", "proj", "bias"), get(f"{att}/out/bias"))
        mlp = f"{b}/MlpBlock_3"
        put(blk + ("mlp", "fc1_kernel"), get(f"{mlp}/Dense_0/kernel"))
        put(blk + ("mlp", "fc1_bias"), get(f"{mlp}/Dense_0/bias"))
        put(blk + ("mlp", "fc2_kernel"), get(f"{mlp}/Dense_1/kernel"))
        put(blk + ("mlp", "fc2_bias"), get(f"{mlp}/Dense_1/bias"))

    put(("norm", "scale"), get("Transformer/encoder_norm/scale"))
    put(("norm", "bias"), get("Transformer/encoder_norm/bias"))
    return {"params": flax.traverse_util.unflatten_dict(out)}


def port_vit_torch_state_dict(state_dict: Mapping[str, np.ndarray], params_template) -> Dict:
    """Fill VitDescriptor params from a torch SSCD/v68 state_dict.

    Expects timm ViT key names under ``backbone.`` plus the SSCD head
    (``embeddings.0.conv`` = GeM 1x1 projection, ``embeddings.1`` = output
    Linear), i.e. exactly a reference v68 checkpoint after stripping the
    ``module.backbone.model.`` DDP prefix (D1/train/train_v106/
    torch2scripts.py:672-699 does the same strip before tracing). A bare
    ``model.`` prefix is stripped automatically.
    """
    import flax

    sd = {}
    for k, v in state_dict.items():
        for prefix in ("module.backbone.model.", "module.backbone.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    flat = flax.traverse_util.flatten_dict(params_template["params"])
    out = dict(flat)

    def put(key, value):
        if key not in out:
            raise KeyError(f"template missing {key}")
        if out[key].shape != value.shape:
            raise ValueError(f"{key}: torch {value.shape} != template {out[key].shape}")
        out[key] = value.astype(np.asarray(out[key]).dtype)

    def linear(dst, src):
        put(dst + ("kernel",), sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            put(dst + ("bias",), sd[f"{src}.bias"])

    def norm(dst, src):
        put(dst + ("scale",), sd[f"{src}.weight"])
        put(dst + ("bias",), sd[f"{src}.bias"])

    bb = ("backbone",)
    put(bb + ("patch_embed", "kernel"), sd["backbone.patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    put(bb + ("patch_embed", "bias"), sd["backbone.patch_embed.proj.bias"])
    put(bb + ("cls_token",), sd["backbone.cls_token"])
    pos = sd["backbone.pos_embed"]
    target = out[bb + ("pos_embed",)].shape[1]
    put(bb + ("pos_embed",), _interp_pos_embed(pos, target))

    i = 0
    while f"backbone.blocks.{i}.norm1.weight" in sd:
        t = f"backbone.blocks.{i}"
        blk = bb + (f"block{i}",)
        norm(blk + ("norm1",), f"{t}.norm1")
        norm(blk + ("norm2",), f"{t}.norm2")
        linear(blk + ("attn", "qkv"), f"{t}.attn.qkv")
        linear(blk + ("attn", "proj"), f"{t}.attn.proj")
        put(blk + ("mlp", "fc1_kernel"), sd[f"{t}.mlp.fc1.weight"].T)
        put(blk + ("mlp", "fc1_bias"), sd[f"{t}.mlp.fc1.bias"])
        put(blk + ("mlp", "fc2_kernel"), sd[f"{t}.mlp.fc2.weight"].T)
        put(blk + ("mlp", "fc2_bias"), sd[f"{t}.mlp.fc2.bias"])
        i += 1

    norm(bb + ("norm",), "backbone.norm")
    # SSCD head: Conv1d(k=1) == Dense over tokens; then the output Linear.
    put(("gem", "proj", "kernel"), sd["embeddings.0.conv.weight"][:, :, 0].T)
    put(("gem", "proj", "bias"), sd["embeddings.0.conv.bias"])
    linear(("head",), "embeddings.1")
    return {"params": flax.traverse_util.unflatten_dict(out)}


def port_clip_torch_state_dict(state_dict: Mapping[str, np.ndarray], params_template) -> Dict:
    """Fill CLIPVisual params from an OpenAI-CLIP visual-tower state_dict.

    Key names follow the reference's vendored tower
    (D1/train/train_vid_score/video/clip.py:85-163), which is the OpenAI
    layout: ``conv1.weight`` (no bias), ``class_embedding``,
    ``positional_embedding``, ``ln_pre``/``ln_post``, and per block
    ``transformer.resblocks.{i}.{ln_1,ln_2,attn.in_proj_*,attn.out_proj,
    mlp.c_fc,mlp.c_proj}``. A leading ``visual.`` prefix (full CLIP
    checkpoints) is stripped automatically — the reference does the same via
    ``revise_keys=[(r'^visual\\.', '')]`` (clip.py:135). The frozen ``proj``
    matrix, text tower, and logit scale are ignored: the reference sets
    ``proj=None`` (clip.py:117) and consumes all tokens post-``ln_post``.

    torch ``nn.MultiheadAttention`` packs Q/K/V row-wise in
    ``in_proj_weight`` [3C, C]; transposed it becomes the fused [C, 3C]
    qkv kernel with the same q|k|v column order our blocks index.
    """
    import flax

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("visual."):
            k = k[len("visual."):]
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    flat = flax.traverse_util.flatten_dict(params_template["params"])
    out = dict(flat)

    def put(key, value):
        if key not in out:
            raise KeyError(f"template missing {key}")
        if out[key].shape != value.shape:
            raise ValueError(f"{key}: torch {value.shape} != template {out[key].shape}")
        out[key] = value.astype(np.asarray(out[key]).dtype)

    def linear(dst, src):
        put(dst + ("kernel",), sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            put(dst + ("bias",), sd[f"{src}.bias"])

    def norm(dst, src):
        put(dst + ("scale",), sd[f"{src}.weight"])
        put(dst + ("bias",), sd[f"{src}.bias"])

    put(("conv1", "kernel"), sd["conv1.weight"].transpose(2, 3, 1, 0))
    put(("class_embedding",), sd["class_embedding"])
    put(("positional_embedding",), sd["positional_embedding"])
    norm(("ln_pre",), "ln_pre")

    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        t = f"transformer.resblocks.{i}"
        blk = (f"block{i}",)
        norm(blk + ("ln_1",), f"{t}.ln_1")
        norm(blk + ("ln_2",), f"{t}.ln_2")
        put(blk + ("attn", "qkv", "kernel"), sd[f"{t}.attn.in_proj_weight"].T)
        put(blk + ("attn", "qkv", "bias"), sd[f"{t}.attn.in_proj_bias"])
        linear(blk + ("attn", "proj"), f"{t}.attn.out_proj")
        linear(blk + ("c_fc",), f"{t}.mlp.c_fc")
        linear(blk + ("c_proj",), f"{t}.mlp.c_proj")
        i += 1

    norm(("ln_post",), "ln_post")
    return {"params": flax.traverse_util.unflatten_dict(out)}


def port_swinv2_torch_state_dict(state_dict: Mapping[str, np.ndarray], params_template) -> Dict:
    """Fill SwinTransformerV2 params from a torch SwinV2 state_dict.

    Key mapping (torch -> flax):
      patch_embed.proj.{weight,bias}       -> patch_embed (OIHW -> HWIO)
      patch_embed.norm                     -> patch_norm
      layers.{s}.blocks.{i}.*              -> stage{s}_block{i}.*
        norm1/norm2, attn.logit_scale, attn.qkv.weight (transposed),
        attn.{q,v}_bias, attn.cpb_mlp.{0,2} -> cpb_fc1/cpb_fc2,
        attn.proj, mlp.fc1/fc2
      layers.{s}.downsample.{reduction,norm} -> merge{s}
      norm                                 -> norm
      output_proj                          -> output_proj
    Extra torch buffers (relative_position_index, relative_coords_table,
    attn_mask) are recomputed statically here and skipped.
    """
    import flax

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    flat = flax.traverse_util.flatten_dict(params_template["params"])
    out = dict(flat)

    def put(key, value):
        if key not in out:
            raise KeyError(f"template missing {key}")
        if out[key].shape != value.shape:
            raise ValueError(f"{key}: torch {value.shape} != template {out[key].shape}")
        out[key] = value.astype(np.asarray(out[key]).dtype)

    def linear(dst, src):
        put(dst + ("kernel",), sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            put(dst + ("bias",), sd[f"{src}.bias"])

    def norm(dst, src):
        put(dst + ("scale",), sd[f"{src}.weight"])
        put(dst + ("bias",), sd[f"{src}.bias"])

    put(("patch_embed", "kernel"), sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    put(("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    norm(("patch_norm",), "patch_embed.norm")

    stage = 0
    while f"layers.{stage}.blocks.0.norm1.weight" in sd:
        i = 0
        while f"layers.{stage}.blocks.{i}.norm1.weight" in sd:
            t = f"layers.{stage}.blocks.{i}"
            f = (f"stage{stage}_block{i}",)
            norm(f + ("norm1",), f"{t}.norm1")
            norm(f + ("norm2",), f"{t}.norm2")
            put(f + ("attn", "logit_scale"), sd[f"{t}.attn.logit_scale"])
            put(f + ("attn", "qkv_kernel"), sd[f"{t}.attn.qkv.weight"].T)
            put(f + ("attn", "q_bias"), sd[f"{t}.attn.q_bias"])
            put(f + ("attn", "v_bias"), sd[f"{t}.attn.v_bias"])
            linear(f + ("attn", "cpb_fc1"), f"{t}.attn.cpb_mlp.0")
            put(f + ("attn", "cpb_fc2", "kernel"), sd[f"{t}.attn.cpb_mlp.2.weight"].T)
            linear(f + ("attn", "proj"), f"{t}.attn.proj")
            put(f + ("mlp", "fc1_kernel"), sd[f"{t}.mlp.fc1.weight"].T)
            put(f + ("mlp", "fc1_bias"), sd[f"{t}.mlp.fc1.bias"])
            put(f + ("mlp", "fc2_kernel"), sd[f"{t}.mlp.fc2.weight"].T)
            put(f + ("mlp", "fc2_bias"), sd[f"{t}.mlp.fc2.bias"])
            i += 1
        if f"layers.{stage}.downsample.reduction.weight" in sd:
            put(
                (f"merge{stage}", "reduction", "kernel"),
                sd[f"layers.{stage}.downsample.reduction.weight"].T,
            )
            norm((f"merge{stage}", "norm"), f"layers.{stage}.downsample.norm")
        stage += 1

    norm(("norm",), "norm")
    linear(("output_proj",), "output_proj")
    return {"params": flax.traverse_util.unflatten_dict(out)}
