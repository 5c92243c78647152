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


def load_torchscript_state_dict(path) -> Dict[str, np.ndarray]:
    """Read a ``torch.jit`` archive's parameters+buffers as a numpy state_dict.

    The reference distributes its trained checkpoints as
    ``torch.jit.trace``d archives of the bare (DDP-prefix-stripped) model
    (D1/train/train_v106/torch2scripts.py:672-699 and the v68/v107/v115
    twins), not as eager ``state_dict`` pickles. Tracing preserves module
    attribute paths, so the loaded ScriptModule's ``state_dict()`` carries
    the same keys as the eager model and feeds every ``port_*`` entry point
    in this module unchanged:

        sd = load_torchscript_state_dict("swinv2_v106.torchscript.pt")
        params = port_swinv2_torch_state_dict(sd, template)
    """
    import torch

    mod = torch.jit.load(str(path), map_location="cpu")
    return {
        k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()
    }


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


def port_vsm_torch_state_dict(state_dict: Mapping[str, np.ndarray], params_template) -> Dict:
    """Fill VideoScoreModel params from the reference MS state_dict.

    The reference video-score model (D1/train/train_vid_score/video/
    model.py:63-103) wraps a HF BERT encoder (chinese-roberta-wwm-ext —
    a BertModel). Key conventions handled here:

      - ``frame_proj.0`` / ``frame_proj.1`` -> frame_proj Dense + frame_norm;
      - ``bert.embeddings.word_embeddings`` rows 101/102 -> the learned
        [CLS]/[SEP] vectors (model.py:29 hardcodes token ids [101, 102]);
      - ``bert.embeddings.position_embeddings`` rows [0, max_frames+2) with
        ``token_type_embeddings`` row 0 folded in (every token is type 0,
        so the fold is exact) -> pos_embed;
      - ``bert.encoder.layer.{i}.attention.self.{query,key,value}``
        concatenated -> the fused qkv kernel;
      - pooler weights are skipped (the reference consumes
        last_hidden_state, model.py:94).

    A leading ``module.`` (DDP) prefix is stripped automatically.
    """
    import flax

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
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
        put(dst + ("bias",), sd[f"{src}.bias"])

    def norm(dst, src):
        put(dst + ("scale",), sd[f"{src}.weight"])
        put(dst + ("bias",), sd[f"{src}.bias"])

    linear(("frame_proj",), "frame_proj.0")
    norm(("frame_norm",), "frame_proj.1")

    word = sd["bert.embeddings.word_embeddings.weight"]
    put(("cls_emb",), word[101])
    put(("sep_emb",), word[102])
    n_pos = out[("pos_embed",)].shape[0]
    pos = sd["bert.embeddings.position_embeddings.weight"][:n_pos]
    tok0 = sd["bert.embeddings.token_type_embeddings.weight"][0]
    put(("pos_embed",), pos + tok0[None, :])
    norm(("emb_norm",), "bert.embeddings.LayerNorm")

    i = 0
    while f"bert.encoder.layer.{i}.attention.self.query.weight" in sd:
        t = f"bert.encoder.layer.{i}"
        blk = (f"layer{i}",)
        qkv_k = np.concatenate(
            [sd[f"{t}.attention.self.{n}.weight"].T for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [sd[f"{t}.attention.self.{n}.bias"] for n in ("query", "key", "value")]
        )
        put(blk + ("attn", "qkv", "kernel"), qkv_k)
        put(blk + ("attn", "qkv", "bias"), qkv_b)
        linear(blk + ("attn", "proj"), f"{t}.attention.output.dense")
        norm(blk + ("ln_attn",), f"{t}.attention.output.LayerNorm")
        linear(blk + ("fc1",), f"{t}.intermediate.dense")
        linear(blk + ("fc2",), f"{t}.output.dense")
        norm(blk + ("ln_mlp",), f"{t}.output.LayerNorm")
        i += 1

    linear(("output_proj",), "output_proj")
    return {"params": flax.traverse_util.unflatten_dict(out)}


def _bn_port_helpers(state_dict, variables_template):
    """Shared plumbing for BatchNorm-bearing CNN ports (MNV3/HRNet).

    Returns (sd, out, put, conv, bn, finish): a numpy-ified state dict, a
    flat {collection: {path: array}} template copy, writers for conv kernels
    (OIHW -> HWIO) and BN (weight/bias -> params, running stats ->
    batch_stats), and a finalizer that re-nests the collections.
    """
    import flax

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    out = {
        coll: dict(flax.traverse_util.flatten_dict(tree))
        for coll, tree in variables_template.items()
    }

    def put(coll, key, value):
        dst = out[coll]
        if key not in dst:
            raise KeyError(f"template[{coll}] missing {key}")
        if dst[key].shape != value.shape:
            raise ValueError(
                f"{coll}/{key}: torch {value.shape} != template {dst[key].shape}"
            )
        dst[key] = value.astype(np.asarray(dst[key]).dtype)

    def conv(dst, src, dense=False):
        w = sd[f"{src}.weight"]
        if dense:  # 1x1 conv consumed as a Dense layer
            put("params", dst + ("kernel",), w[:, :, 0, 0].T)
        else:
            put("params", dst + ("kernel",), w.transpose(2, 3, 1, 0))
        if f"{src}.bias" in sd:
            put("params", dst + ("bias",), sd[f"{src}.bias"])

    def bn(dst, src):
        put("params", dst + ("scale",), sd[f"{src}.weight"])
        put("params", dst + ("bias",), sd[f"{src}.bias"])
        put("batch_stats", dst + ("mean",), sd[f"{src}.running_mean"])
        put("batch_stats", dst + ("var",), sd[f"{src}.running_var"])

    def finish():
        return {
            coll: flax.traverse_util.unflatten_dict(flat)
            for coll, flat in out.items()
        }

    return sd, out, put, conv, bn, finish


def port_hrnet_torch_state_dict(state_dict: Mapping[str, np.ndarray], variables_template) -> Dict:
    """Fill SAMHRNet variables from a timm `hrnet_w18` state_dict or the
    M1 SAM wrapper checkpoint (M1/train/models.py:20-48).

    Accepted key layouts:
      - raw timm hrnet keys (conv1/bn1, conv2/bn2, layer1.{b}.*,
        transition{1,2,3}.*, stage{2,3,4}.{m}.{branches,fuse_layers}.*) —
        fills the backbone, leaves the fuse head at its template init
        (the reference fine-tunes a fresh head on ImageNet weights);
      - the wrapper layout with a `model.` backbone prefix plus
        `fuse.0`/`fuse.2` head convs — fills everything.

    Stage/module/branch counts are discovered by key probing, so tiny test
    configs port through the same code path as full W18. Returns
    {params, batch_stats}.
    """
    sd, out, put, conv, bn, finish = _bn_port_helpers(state_dict, variables_template)

    for k in list(sd):
        if k.startswith("model."):
            sd[k[len("model."):]] = sd.pop(k)

    def cbn(dst, conv_src, bn_src):
        conv(dst + ("Conv_0",), conv_src)
        bn(dst + ("BatchNorm_0",), bn_src)

    B = ("backbone",)
    cbn(B + ("stem1",), "conv1", "bn1")
    cbn(B + ("stem2",), "conv2", "bn2")

    b = 0
    while f"layer1.{b}.conv1.weight" in sd:
        t, blk = f"layer1.{b}", B + (f"layer1_{b}",)
        for n in (1, 2, 3):
            cbn(blk + (f"conv{n}",), f"{t}.conv{n}", f"{t}.bn{n}")
        if f"{t}.downsample.0.weight" in sd:
            cbn(blk + ("downsample",), f"{t}.downsample.0", f"{t}.downsample.1")
        b += 1

    cbn(B + ("trans1_0",), "transition1.0.0", "transition1.0.1")
    cbn(B + ("trans1_1",), "transition1.1.0.0", "transition1.1.0.1")
    cbn(B + ("trans2",), "transition2.2.0.0", "transition2.2.0.1")
    cbn(B + ("trans3",), "transition3.3.0.0", "transition3.3.0.1")

    for s in (2, 3, 4):
        m = 0
        while f"stage{s}.{m}.branches.0.0.conv1.weight" in sd:
            t, mod = f"stage{s}.{m}", B + (f"stage{s}_m{m}",)
            i = 0
            while f"{t}.branches.{i}.0.conv1.weight" in sd:
                j = 0
                while f"{t}.branches.{i}.{j}.conv1.weight" in sd:
                    dst = mod + (f"branch{i}_block{j}",)
                    src = f"{t}.branches.{i}.{j}"
                    cbn(dst + ("conv1",), f"{src}.conv1", f"{src}.bn1")
                    cbn(dst + ("conv2",), f"{src}.conv2", f"{src}.bn2")
                    j += 1
                i += 1
            for fi in range(i):
                for fj in range(i):
                    if fj == fi:
                        continue
                    f = f"{t}.fuse_layers.{fi}.{fj}"
                    if fj > fi:
                        cbn(mod + (f"fuse{fi}_{fj}",), f"{f}.0", f"{f}.1")
                    else:
                        for k in range(fi - fj):
                            cbn(
                                mod + (f"fuse{fi}_{fj}_step{k}",),
                                f"{f}.{k}.0",
                                f"{f}.{k}.1",
                            )
            m += 1

    if "fuse.0.weight" in sd:
        conv(("fuse1",), "fuse.0")
        conv(("fuse2",), "fuse.2")
    return finish()


def port_mnv3_torch_state_dict(state_dict: Mapping[str, np.ndarray], variables_template) -> Dict:
    """Fill MobileNetV3Small variables from a timm `mobilenetv3_small_100`
    state_dict (the matching-track ClassifyModel backbone,
    M1/train/models.py:6-16).

    timm's flat block indices map onto stages [1, 2, 3, 2, 3] + the 576-ch
    ConvBnAct stage; blocks.0.0 is a DepthwiseSeparableConv (conv_dw/bn1 +
    se + conv_pw/bn2), later blocks are InvertedResiduals (conv_pw/bn1 +
    conv_dw/bn2 + [se] + conv_pwl/bn3). conv_head (applied post-pool) lands
    on the pre_logits Dense. Returns {params, batch_stats}.
    """
    from vsc22_tpu.models.mobilenetv3 import MNV3_SMALL_SPEC

    sd, out, put, conv, bn, finish = _bn_port_helpers(state_dict, variables_template)

    def se(dst, src):
        put("params", dst + ("fc1", "kernel"), sd[f"{src}.conv_reduce.weight"][:, :, 0, 0].T)
        put("params", dst + ("fc1", "bias"), sd[f"{src}.conv_reduce.bias"])
        put("params", dst + ("fc2", "kernel"), sd[f"{src}.conv_expand.weight"][:, :, 0, 0].T)
        put("params", dst + ("fc2", "bias"), sd[f"{src}.conv_expand.bias"])

    conv(("stem", "Conv_0"), "conv_stem")
    bn(("stem", "BatchNorm_0"), "bn1")

    stages = (1, 2, 3, 2, 3)
    flat_idx = [(s, j) for s, n in enumerate(stages) for j in range(n)]
    for i, ((s, j), row) in enumerate(zip(flat_idx, MNV3_SMALL_SPEC)):
        t = f"blocks.{s}.{j}"
        blk = (f"block{i}",)
        _, _exp, _, se_rd, _, _ = row
        if i == 0:  # DepthwiseSeparableConv
            conv(blk + ("dw", "Conv_0"), f"{t}.conv_dw")
            bn(blk + ("dw", "BatchNorm_0"), f"{t}.bn1")
            se(blk + ("se",), f"{t}.se")
            conv(blk + ("project", "Conv_0"), f"{t}.conv_pw")
            bn(blk + ("project", "BatchNorm_0"), f"{t}.bn2")
        else:
            conv(blk + ("expand", "Conv_0"), f"{t}.conv_pw")
            bn(blk + ("expand", "BatchNorm_0"), f"{t}.bn1")
            conv(blk + ("dw", "Conv_0"), f"{t}.conv_dw")
            bn(blk + ("dw", "BatchNorm_0"), f"{t}.bn2")
            if se_rd:
                se(blk + ("se",), f"{t}.se")
            conv(blk + ("project", "Conv_0"), f"{t}.conv_pwl")
            bn(blk + ("project", "BatchNorm_0"), f"{t}.bn3")

    conv(("head_conv", "Conv_0"), "blocks.5.0.conv")
    bn(("head_conv", "BatchNorm_0"), "blocks.5.0.bn1")
    conv(("pre_logits",), "conv_head", dense=True)
    put("params", ("classifier", "kernel"), sd["classifier.weight"].T)
    put("params", ("classifier", "bias"), sd["classifier.bias"])
    return finish()


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
