"""Pretrained-weight porting for segmentation backbones.

Behavioral reference: the reference's `init_weights` paths — mmcv-style
`load_checkpoint` with prefix stripping (ED/mmcv_custom/checkpoint.py:287-330)
and the RVSA MAE loader with pos-embed interpolation
(vit_win_rvsa_v3_wsz7.py:693-776).  Loads timm/MAE-style torch ViT state
dicts into our ViT/RVSA trunks NON-strictly: matching tensors load (qkv, proj,
norms, mlp, patch embed, interpolated pos embed), RVSA-specific params
(sampling nets, rel-pos tables) keep their init — exactly the reference's
strict=False behavior.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np


def _strip_prefixes(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for pre in ("module.", "backbone.", "encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def interpolate_pos_embed(
    pos: np.ndarray, target_tokens: int, has_cls: bool = True
) -> np.ndarray:
    """(1, (1+)N, D) -> (1, target, D) bicubic grid resize
    (vit_win_rvsa_v3_wsz7.py:743-768)."""
    import jax
    import jax.numpy as jnp

    if has_cls and pos.shape[1] % int(round(pos.shape[1] ** 0.5)) ** 2 != 0:
        pos = pos[:, 1:]
    elif has_cls and int(round((pos.shape[1] - 1) ** 0.5)) ** 2 == pos.shape[1] - 1:
        pos = pos[:, 1:]
    n = pos.shape[1]
    g_old = int(round(n**0.5))
    g_new = int(round(target_tokens**0.5))
    if g_old * g_old != n:
        raise ValueError(f"pos embed length {n} is not square")
    if g_old == g_new:
        return np.asarray(pos, np.float32)
    grid = jnp.asarray(pos, jnp.float32).reshape(1, g_old, g_old, -1)
    grid = jax.image.resize(grid, (1, g_new, g_new, grid.shape[-1]), "bicubic")
    return np.asarray(grid.reshape(1, g_new * g_new, -1))


def load_torch_vit_backbone(
    state_dict: Mapping[str, Any], params: Dict[str, Any]
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Non-strict load of a timm/MAE ViT state dict into our trunk params.

    Returns (new_params, loaded_keys, skipped_torch_keys)."""
    sd = _strip_prefixes(
        {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
         for k, v in state_dict.items()}
    )
    params = dict(params)  # shallow; subtrees replaced as needed
    loaded: List[str] = []
    skipped: List[str] = []

    import copy

    params = copy.deepcopy(params)

    def try_set(flax_path: List[str], value: np.ndarray, tk: str) -> None:
        node = params
        for k in flax_path[:-1]:
            if k not in node:
                skipped.append(tk)
                return
            node = node[k]
        leaf = flax_path[-1]
        if leaf not in node:
            skipped.append(tk)
            return
        if tuple(np.shape(node[leaf])) != tuple(value.shape):
            skipped.append(tk)
            return
        node[leaf] = value
        loaded.append(tk)

    for tk, v in sd.items():
        if tk in ("cls_token", "mask_token", "norm.weight", "norm.bias"):
            skipped.append(tk)
            continue
        if tk == "pos_embed":
            if "pos_embed" in params:
                tgt = np.shape(params["pos_embed"])
                try:
                    v2 = interpolate_pos_embed(v, tgt[1], has_cls=True)
                    if v2.shape == tuple(tgt):
                        params["pos_embed"] = v2
                        loaded.append(tk)
                        continue
                except ValueError:
                    pass
            skipped.append(tk)
            continue
        if tk.startswith("patch_embed.proj."):
            if tk.endswith("weight"):
                try_set(["patch_embed", "kernel"], v.transpose(2, 3, 1, 0), tk)
            else:
                try_set(["patch_embed", "bias"], v, tk)
            continue
        m = re.match(r"blocks\.(\d+)\.(.*)", tk)
        if m:
            i, rest = m.group(1), m.group(2)
            blk = f"blocks_{i}"
            table = {
                "norm1.weight": ([blk, "norm1", "scale"], None),
                "norm1.bias": ([blk, "norm1", "bias"], None),
                "norm2.weight": ([blk, "norm2", "scale"], None),
                "norm2.bias": ([blk, "norm2", "bias"], None),
                "attn.qkv.weight": ([blk, "attn", "qkv", "kernel"], "T"),
                "attn.qkv.bias": ([blk, "attn", "qkv", "bias"], None),
                "attn.proj.weight": ([blk, "attn", "proj", "kernel"], "T"),
                "attn.proj.bias": ([blk, "attn", "proj", "bias"], None),
                "mlp.fc1.weight": ([blk, "mlp", "lin1", "kernel"], "T"),
                "mlp.fc1.bias": ([blk, "mlp", "lin1", "bias"], None),
                "mlp.fc2.weight": ([blk, "mlp", "lin2", "kernel"], "T"),
                "mlp.fc2.bias": ([blk, "mlp", "lin2", "bias"], None),
                "attn.rel_pos_h": ([blk, "attn", "rel_pos_h"], None),
                "attn.rel_pos_w": ([blk, "attn", "rel_pos_w"], None),
            }
            if rest in table:
                path, op = table[rest]
                try_set(path, v.T if op == "T" else v, tk)
            else:
                skipped.append(tk)
            continue
        skipped.append(tk)

    return params, loaded, skipped


def load_torch_swin_backbone(
    state_dict: Mapping[str, Any], params: Dict[str, Any]
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Non-strict load of a timm/mmseg Swin state dict into our Swin params.

    torch names `layers.{s}.blocks.{b}.*` map to `stage{s}_block{b}/*`;
    `layers.{s}.downsample.*` to `merge{s}/*`; per-stage `norm{s}` heads to
    `norm{s}` (the mmseg out-norm convention ED/backbone/swin.py keeps)."""
    import copy

    sd = _strip_prefixes(
        {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
         for k, v in state_dict.items()}
    )
    params = copy.deepcopy(params)
    loaded: List[str] = []
    skipped: List[str] = []

    def try_set(flax_path: List[str], value: np.ndarray, tk: str) -> None:
        node = params
        for k in flax_path[:-1]:
            if k not in node:
                skipped.append(tk)
                return
            node = node[k]
        leaf = flax_path[-1]
        if leaf not in node or tuple(np.shape(node[leaf])) != tuple(value.shape):
            skipped.append(tk)
            return
        node[leaf] = value
        loaded.append(tk)

    for tk, v in sd.items():
        if tk.startswith("patch_embed.proj."):
            if tk.endswith("weight"):
                try_set(["patch_embed", "kernel"], v.transpose(2, 3, 1, 0), tk)
            else:
                try_set(["patch_embed", "bias"], v, tk)
            continue
        if tk.startswith("patch_embed.norm."):
            try_set(["patch_norm", "scale" if tk.endswith("weight") else "bias"], v, tk)
            continue
        m = re.match(r"norm(\d+)\.(weight|bias)", tk)
        if m:
            try_set([f"norm{m.group(1)}", "scale" if m.group(2) == "weight" else "bias"],
                    v, tk)
            continue
        m = re.match(r"layers\.(\d+)\.downsample\.(.*)", tk)
        if m:
            s, rest = m.group(1), m.group(2)
            table = {
                "reduction.weight": ([f"merge{s}", "reduction", "kernel"], "T"),
                "norm.weight": ([f"merge{s}", "norm", "scale"], None),
                "norm.bias": ([f"merge{s}", "norm", "bias"], None),
            }
            if rest in table:
                path, op = table[rest]
                try_set(path, v.T if op == "T" else v, tk)
            else:
                skipped.append(tk)
            continue
        m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.(.*)", tk)
        if m:
            s, b, rest = m.group(1), m.group(2), m.group(3)
            blk = f"stage{s}_block{b}"
            table = {
                "norm1.weight": ([blk, "norm1", "scale"], None),
                "norm1.bias": ([blk, "norm1", "bias"], None),
                "norm2.weight": ([blk, "norm2", "scale"], None),
                "norm2.bias": ([blk, "norm2", "bias"], None),
                "attn.qkv.weight": ([blk, "attn", "qkv", "kernel"], "T"),
                "attn.qkv.bias": ([blk, "attn", "qkv", "bias"], None),
                "attn.proj.weight": ([blk, "attn", "proj", "kernel"], "T"),
                "attn.proj.bias": ([blk, "attn", "proj", "bias"], None),
                "attn.relative_position_bias_table": (
                    [blk, "attn", "relative_position_bias_table"], None),
                "mlp.fc1.weight": ([blk, "mlp", "lin1", "kernel"], "T"),
                "mlp.fc1.bias": ([blk, "mlp", "lin1", "bias"], None),
                "mlp.fc2.weight": ([blk, "mlp", "lin2", "kernel"], "T"),
                "mlp.fc2.bias": ([blk, "mlp", "lin2", "bias"], None),
            }
            if rest in table:
                path, op = table[rest]
                try_set(path, v.T if op == "T" else v, tk)
            else:
                skipped.append(tk)  # relative_position_index buffers etc.
            continue
        skipped.append(tk)
    return params, loaded, skipped


def load_torch_resnet_backbone(
    state_dict: Mapping[str, Any],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any], List[str], List[str]]:
    """Non-strict load of a torchvision/mmseg ResNet state dict.

    The reference initializes its mmseg ResNet-50 from torchvision
    `resnet50-19c8e357.pth` or the RSP checkpoint (ED/models.py:201-206); both
    use torchvision key names (`conv1/bn1`, `layer{l}.{b}.conv{j}/bn{j}`,
    `layer{l}.{b}.downsample.{0,1}`).  BatchNorm running statistics load into
    flax `batch_stats` (mean/var)."""
    import copy

    sd = _strip_prefixes(
        {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
         for k, v in state_dict.items()}
    )
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    loaded: List[str] = []
    skipped: List[str] = []

    def try_set(tree, flax_path: List[str], value: np.ndarray, tk: str) -> None:
        node = tree
        for k in flax_path[:-1]:
            if k not in node:
                skipped.append(tk)
                return
            node = node[k]
        leaf = flax_path[-1]
        if leaf not in node or tuple(np.shape(node[leaf])) != tuple(value.shape):
            skipped.append(tk)
            return
        node[leaf] = value
        loaded.append(tk)

    def set_bn(prefix: List[str], torch_prefix: str) -> None:
        for t_leaf, tree, f_leaf in (
            ("weight", params, "scale"),
            ("bias", params, "bias"),
            ("running_mean", batch_stats, "mean"),
            ("running_var", batch_stats, "var"),
        ):
            tk = f"{torch_prefix}.{t_leaf}"
            if tk in sd:
                try_set(tree, prefix + [f_leaf], sd[tk], tk)
        consumed.update(
            f"{torch_prefix}.{s}" for s in
            ("weight", "bias", "running_mean", "running_var", "num_batches_tracked")
        )

    consumed: set = set()
    if "conv1.weight" in sd:
        try_set(params, ["stem_conv", "kernel"], sd["conv1.weight"].transpose(2, 3, 1, 0),
                "conv1.weight")
        consumed.add("conv1.weight")
    set_bn(["stem_bn"], "bn1")
    for tk, v in sd.items():
        if tk in consumed:
            continue
        m = re.match(r"layer(\d+)\.(\d+)\.conv(\d)\.weight", tk)
        if m:
            blk = f"layer{m.group(1)}_block{m.group(2)}"
            try_set(params, [blk, f"conv{m.group(3)}", "kernel"],
                    v.transpose(2, 3, 1, 0), tk)
            continue
        m = re.match(r"layer(\d+)\.(\d+)\.bn(\d)\.", tk)
        if m:
            blk = f"layer{m.group(1)}_block{m.group(2)}"
            set_bn([blk, f"bn{m.group(3)}"], tk.rsplit(".", 1)[0])
            continue
        m = re.match(r"layer(\d+)\.(\d+)\.downsample\.0\.weight", tk)
        if m:
            blk = f"layer{m.group(1)}_block{m.group(2)}"
            try_set(params, [blk, "downsample_conv", "kernel"],
                    v.transpose(2, 3, 1, 0), tk)
            continue
        m = re.match(r"layer(\d+)\.(\d+)\.downsample\.1\.", tk)
        if m:
            blk = f"layer{m.group(1)}_block{m.group(2)}"
            set_bn([blk, "downsample_bn"], tk.rsplit(".", 1)[0])
            continue
        if tk.endswith("num_batches_tracked") or tk.startswith("fc."):
            continue  # classifier head / BN step counters: intentionally dropped
        if tk not in consumed:
            skipped.append(tk)
    return params, batch_stats, sorted(set(loaded)), sorted(set(skipped) - consumed)


def load_torch_internimage_backbone(
    state_dict: Mapping[str, Any], params: Dict[str, Any]
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Non-strict load of an official InternImage state dict (the reference
    init path loads `internimage_t_1k_224.pth`, ED/models.py:246-248).

    Key layout (ED/backbone/intern_image.py): `patch_embed.conv{1,2}` +
    `norm{1,2}.1` (LN wrapped in a permute Sequential), `levels.{i}.blocks.{b}`
    with `norm{1,2}.0`, `gamma{1,2}` (layer scale), `dcn.*`
    (ops_dcnv3/modules/dcnv3.py:221-320), `mlp.fc{1,2}`, and
    `levels.{i}.downsample.{conv,norm.1}`."""
    sd = _strip_prefixes(
        {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
         for k, v in state_dict.items()}
    )
    params, loaded, skipped, try_set = _make_try_set(params)

    stem = {
        "patch_embed.conv1.weight": (["stem_conv1", "kernel"], "conv"),
        "patch_embed.conv1.bias": (["stem_conv1", "bias"], None),
        "patch_embed.norm1.1.weight": (["stem_norm1", "scale"], None),
        "patch_embed.norm1.1.bias": (["stem_norm1", "bias"], None),
        "patch_embed.conv2.weight": (["stem_conv2", "kernel"], "conv"),
        "patch_embed.conv2.bias": (["stem_conv2", "bias"], None),
        "patch_embed.norm2.1.weight": (["stem_norm2", "scale"], None),
        "patch_embed.norm2.1.bias": (["stem_norm2", "bias"], None),
    }
    block_table = {
        "norm1.0.weight": (["norm1", "scale"], None),
        "norm1.0.bias": (["norm1", "bias"], None),
        "norm2.0.weight": (["norm2", "scale"], None),
        "norm2.0.bias": (["norm2", "bias"], None),
        "gamma1": (["gamma1"], None),
        "gamma2": (["gamma2"], None),
        "dcn.input_proj.weight": (["dcn", "input_proj", "kernel"], "T"),
        "dcn.input_proj.bias": (["dcn", "input_proj", "bias"], None),
        "dcn.output_proj.weight": (["dcn", "output_proj", "kernel"], "T"),
        "dcn.output_proj.bias": (["dcn", "output_proj", "bias"], None),
        "dcn.offset.weight": (["dcn", "offset", "kernel"], "T"),
        "dcn.offset.bias": (["dcn", "offset", "bias"], None),
        "dcn.mask.weight": (["dcn", "mask", "kernel"], "T"),
        "dcn.mask.bias": (["dcn", "mask", "bias"], None),
        "dcn.dw_conv.0.weight": (["dcn", "dw_conv", "kernel"], "conv"),
        "dcn.dw_conv.0.bias": (["dcn", "dw_conv", "bias"], None),
        "dcn.dw_conv.1.1.weight": (["dcn", "dw_norm", "scale"], None),
        "dcn.dw_conv.1.1.bias": (["dcn", "dw_norm", "bias"], None),
        "mlp.fc1.weight": (["mlp", "lin1", "kernel"], "T"),
        "mlp.fc1.bias": (["mlp", "lin1", "bias"], None),
        "mlp.fc2.weight": (["mlp", "lin2", "kernel"], "T"),
        "mlp.fc2.bias": (["mlp", "lin2", "bias"], None),
    }

    def convert(v, op):
        if op == "T":
            return v.T
        if op == "conv":
            return v.transpose(2, 3, 1, 0)
        return v

    for tk, v in sd.items():
        if tk in stem:
            path, op = stem[tk]
            try_set(path, convert(v, op), tk)
            continue
        m = re.match(r"levels\.(\d+)\.blocks\.(\d+)\.(.*)", tk)
        if m:
            i, b, rest = m.group(1), m.group(2), m.group(3)
            if rest in block_table:
                path, op = block_table[rest]
                try_set([f"level{i}_block{b}"] + path, convert(v, op), tk)
            else:
                skipped.append(tk)
            continue
        m = re.match(r"levels\.(\d+)\.norm\.0\.(weight|bias)", tk)
        if m:
            try_set([f"level_norm{m.group(1)}",
                     "scale" if m.group(2) == "weight" else "bias"], v, tk)
            continue
        m = re.match(r"levels\.(\d+)\.downsample\.conv\.weight", tk)
        if m:
            try_set([f"downsample{m.group(1)}", "kernel"], convert(v, "conv"), tk)
            continue
        m = re.match(r"levels\.(\d+)\.downsample\.norm\.1\.(weight|bias)", tk)
        if m:
            try_set([f"downsample_norm{m.group(1)}",
                     "scale" if m.group(2) == "weight" else "bias"], v, tk)
            continue
        if tk.startswith(("conv_head.", "head.", "norm.")):  # cls head: dropped
            continue
        skipped.append(tk)
    return params, loaded, skipped


def load_torch_vitae_backbone(
    state_dict: Mapping[str, Any],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any], List[str], List[str]]:
    """Non-strict load of a ViTAEv2 state dict (ED/backbone/ViTAE_Window_NoShift).

    Key layout: `layers.{s}.RC.{PRM.convs.{j}.0, PCM.{0,3,6}/{1,4},
    attn.{norm1,norm2,mlp.fc*,attn.{qkv,proj}}}` and
    `layers.{s}.NC.{b}.{norm*,attn.{qkv,proj},PCM.*,mlp.fc*}`.
    relative_position_bias_table / attn_mask / out-stage `norm{i}` heads are
    dead parameters in vitaev2_s (relative_pos=False; out-norms commented out
    in forward, base_model.py:293-295) and are dropped.  PCM BatchNorm
    statistics load into `batch_stats`."""
    import copy

    sd = _strip_prefixes(
        {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
         for k, v in state_dict.items()}
    )
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    loaded: List[str] = []
    skipped: List[str] = []

    def try_set(tree, flax_paths, value, tk):
        """Set the first path that exists (attention nesting differs between
        the swin-windowed and plain-transformer stages)."""
        for flax_path in flax_paths:
            node = tree
            ok = True
            for k in flax_path[:-1]:
                if k not in node:
                    ok = False
                    break
                node = node[k]
            if ok and flax_path[-1] in node and \
                    tuple(np.shape(node[flax_path[-1]])) == tuple(value.shape):
                node[flax_path[-1]] = value
                loaded.append(tk)
                return
        skipped.append(tk)

    dead = ("relative_position_bias_table", "relative_position_index", "attn_mask")
    pcm_conv = {"0": "conv0", "3": "conv1", "6": "conv2"}
    pcm_bn = {"1": "bn0", "4": "bn1"}

    def handle_pcm(cell: str, rest: str, v, tk) -> bool:
        m = re.match(r"PCM\.(\d)\.(weight|bias|running_mean|running_var|num_batches_tracked)", rest)
        if not m:
            return False
        idx, leaf = m.group(1), m.group(2)
        if leaf == "num_batches_tracked":
            loaded.append(tk)
        elif idx in pcm_conv:
            if leaf == "weight":
                try_set(params, [[cell, "pcm", pcm_conv[idx], "kernel"]],
                        v.transpose(2, 3, 1, 0), tk)
            else:
                try_set(params, [[cell, "pcm", pcm_conv[idx], "bias"]], v, tk)
        elif idx in pcm_bn:
            if leaf in ("weight", "bias"):
                try_set(params, [[cell, "pcm", pcm_bn[idx],
                                  "scale" if leaf == "weight" else "bias"]], v, tk)
            else:
                try_set(batch_stats, [[cell, "pcm", pcm_bn[idx],
                                       "mean" if leaf == "running_mean" else "var"]], v, tk)
        else:
            skipped.append(tk)
        return True

    for tk, v in sd.items():
        if any(d in tk for d in dead) or re.match(r"norm\d\.(weight|bias)", tk):
            loaded.append(tk)  # intentionally-dead reference parameters
            continue
        m = re.match(r"layers\.(\d+)\.RC\.(.*)", tk)
        if m:
            s, rest = m.group(1), m.group(2)
            cell = f"rc{s}"
            pm = re.match(r"PRM\.convs\.(\d+)\.0\.(weight|bias)", rest)
            if pm:
                j, leaf = int(pm.group(1)), pm.group(2)
                dil = ((1, 2, 3, 4), (1, 2, 3), (1, 2), (1, 2))[int(s)][j]
                val = v.transpose(2, 3, 1, 0) if leaf == "weight" else v
                try_set(params, [[cell, f"prm_conv{dil}", "kernel" if leaf == "weight" else "bias"]], val, tk)
                continue
            if handle_pcm(cell, rest, v, tk):
                continue
            table = {
                "attn.norm1.weight": ([cell, "norm1", "scale"], None),
                "attn.norm1.bias": ([cell, "norm1", "bias"], None),
                "attn.norm2.weight": ([cell, "norm2", "scale"], None),
                "attn.norm2.bias": ([cell, "norm2", "bias"], None),
                "attn.mlp.fc1.weight": ([cell, "mlp", "lin1", "kernel"], "T"),
                "attn.mlp.fc1.bias": ([cell, "mlp", "lin1", "bias"], None),
                "attn.mlp.fc2.weight": ([cell, "mlp", "lin2", "kernel"], "T"),
                "attn.mlp.fc2.bias": ([cell, "mlp", "lin2", "bias"], None),
            }
            if rest in table:
                path, op = table[rest]
                try_set(params, [path], v.T if op == "T" else v, tk)
                continue
            am = re.match(r"attn\.attn\.(qkv|proj)\.(weight|bias)", rest)
            if am:
                mod, leaf = am.group(1), am.group(2)
                val = v.T if leaf == "weight" else v
                fl = "kernel" if leaf == "weight" else "bias"
                try_set(params, [[cell, "attn", "attn", mod, fl],
                                 [cell, "attn", mod, fl]], val, tk)
                continue
            skipped.append(tk)
            continue
        m = re.match(r"layers\.(\d+)\.NC\.(\d+)\.(.*)", tk)
        if m:
            s, b, rest = m.group(1), m.group(2), m.group(3)
            cell = f"nc{s}_{b}"
            if handle_pcm(cell, rest, v, tk):
                continue
            table = {
                "norm1.weight": ([cell, "norm1", "scale"], None),
                "norm1.bias": ([cell, "norm1", "bias"], None),
                "norm2.weight": ([cell, "norm2", "scale"], None),
                "norm2.bias": ([cell, "norm2", "bias"], None),
                "mlp.fc1.weight": ([cell, "mlp", "lin1", "kernel"], "T"),
                "mlp.fc1.bias": ([cell, "mlp", "lin1", "bias"], None),
                "mlp.fc2.weight": ([cell, "mlp", "lin2", "kernel"], "T"),
                "mlp.fc2.bias": ([cell, "mlp", "lin2", "bias"], None),
            }
            if rest in table:
                path, op = table[rest]
                try_set(params, [path], v.T if op == "T" else v, tk)
                continue
            am = re.match(r"attn\.(qkv|proj)\.(weight|bias)", rest)
            if am:
                mod, leaf = am.group(1), am.group(2)
                val = v.T if leaf == "weight" else v
                fl = "kernel" if leaf == "weight" else "bias"
                try_set(params, [[cell, "attn", "attn", mod, fl],
                                 [cell, "attn", mod, fl]], val, tk)
                continue
            skipped.append(tk)
            continue
        skipped.append(tk)
    return params, batch_stats, loaded, skipped


def load_torch_vit_adapter_backbone(
    state_dict: Mapping[str, Any],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any], List[str], List[str]]:
    """Non-strict load of a ViT-Adapter state dict (ED/backbone/vit_adapter.py;
    also accepts plain DeiT/MAE ViT checkpoints, which simply lack the adapter
    keys).  pos_embed drops the cls slot; SPM/final BatchNorm statistics load
    into `batch_stats`; ConvTranspose `up` uses the flipped-kernel convention
    (verified in tests/test_port.py)."""
    import copy

    sd = _strip_prefixes(
        {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
         for k, v in state_dict.items()}
    )
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    loaded: List[str] = []
    skipped: List[str] = []

    def try_set(tree, flax_path, value, tk):
        node = tree
        for k in flax_path[:-1]:
            if k not in node:
                skipped.append(tk)
                return
            node = node[k]
        leaf = flax_path[-1]
        if leaf not in node or tuple(np.shape(node[leaf])) != tuple(value.shape):
            skipped.append(tk)
            return
        node[leaf] = value
        loaded.append(tk)

    def set_bn(prefix: List[str], torch_prefix: str) -> None:
        for t_leaf, tree, f_leaf in (
            ("weight", params, "scale"), ("bias", params, "bias"),
            ("running_mean", batch_stats, "mean"), ("running_var", batch_stats, "var"),
        ):
            tk = f"{torch_prefix}.{t_leaf}"
            if tk in sd:
                try_set(tree, prefix + [f_leaf], sd[tk], tk)

    def deform_attn(prefix: List[str], torch_prefix: str) -> None:
        for mod in ("value_proj", "sampling_offsets", "attention_weights", "output_proj"):
            for leaf in ("weight", "bias"):
                tk = f"{torch_prefix}.{mod}.{leaf}"
                if tk in sd:
                    try_set(params, prefix + [mod, "kernel" if leaf == "weight" else "bias"],
                            sd[tk].T if leaf == "weight" else sd[tk], tk)

    def extractor(prefix: str, torch_prefix: str) -> None:
        for tn, fn in (("query_norm", "query_norm"), ("feat_norm", "feat_norm"),
                       ("ffn_norm", "ffn_norm")):
            for leaf in ("weight", "bias"):
                tk = f"{torch_prefix}.{tn}.{leaf}"
                if tk in sd:
                    try_set(params, [prefix, fn, "scale" if leaf == "weight" else "bias"],
                            sd[tk], tk)
        deform_attn([prefix, "attn"], f"{torch_prefix}.attn")
        for tn, fn in (("ffn.fc1", ["ffn", "fc1"]), ("ffn.fc2", ["ffn", "fc2"])):
            for leaf in ("weight", "bias"):
                tk = f"{torch_prefix}.{tn}.{leaf}"
                if tk in sd:
                    try_set(params, [prefix] + fn + ["kernel" if leaf == "weight" else "bias"],
                            sd[tk].T if leaf == "weight" else sd[tk], tk)
        for leaf in ("weight", "bias"):
            tk = f"{torch_prefix}.ffn.dwconv.dwconv.{leaf}"
            if tk in sd:
                val = sd[tk].transpose(2, 3, 1, 0) if leaf == "weight" else sd[tk]
                try_set(params, [prefix, "ffn", "dwconv",
                                 "kernel" if leaf == "weight" else "bias"], val, tk)

    consumed = set()

    def mark(*keys):
        consumed.update(keys)

    # ---- ViT trunk ----
    if "pos_embed" in sd:
        pos = sd["pos_embed"]
        tgt = np.shape(params.get("pos_embed", np.zeros((1, 0, 1))))
        if pos.shape[1] == tgt[1] + 1:
            pos = pos[:, 1:]
        if pos.shape[1] != tgt[1]:
            try:
                pos = interpolate_pos_embed(pos, tgt[1], has_cls=False)
            except ValueError:
                pass
        if pos.shape == tuple(tgt):
            params["pos_embed"] = pos
            loaded.append("pos_embed")
        else:
            skipped.append("pos_embed")
        mark("pos_embed")
    for leaf in ("weight", "bias"):
        tk = f"patch_embed.proj.{leaf}"
        if tk in sd:
            val = sd[tk].transpose(2, 3, 1, 0) if leaf == "weight" else sd[tk]
            try_set(params, ["patch_embed", "kernel" if leaf == "weight" else "bias"], val, tk)
            mark(tk)
    if "level_embed" in sd:
        try_set(params, ["level_embed"], sd["level_embed"], "level_embed")
        mark("level_embed")

    for tk, v in sd.items():
        if tk in consumed:
            continue
        m = re.match(r"blocks\.(\d+)\.(.*)", tk)
        if m:
            i, rest = m.group(1), m.group(2)
            table = {
                "gamma1": ([f"blocks_{i}_gamma1"], None),
                "gamma2": ([f"blocks_{i}_gamma2"], None),
                "norm1.weight": ([f"blocks_{i}_norm1", "scale"], None),
                "norm1.bias": ([f"blocks_{i}_norm1", "bias"], None),
                "norm2.weight": ([f"blocks_{i}_norm2", "scale"], None),
                "norm2.bias": ([f"blocks_{i}_norm2", "bias"], None),
                "attn.qkv.weight": ([f"blocks_{i}_attn", "qkv", "kernel"], "T"),
                "attn.qkv.bias": ([f"blocks_{i}_attn", "qkv", "bias"], None),
                "attn.proj.weight": ([f"blocks_{i}_attn", "proj", "kernel"], "T"),
                "attn.proj.bias": ([f"blocks_{i}_attn", "proj", "bias"], None),
                "mlp.fc1.weight": ([f"blocks_{i}_mlp", "lin1", "kernel"], "T"),
                "mlp.fc1.bias": ([f"blocks_{i}_mlp", "lin1", "bias"], None),
                "mlp.fc2.weight": ([f"blocks_{i}_mlp", "lin2", "kernel"], "T"),
                "mlp.fc2.bias": ([f"blocks_{i}_mlp", "lin2", "bias"], None),
            }
            if rest in table:
                path, op = table[rest]
                try_set(params, path, v.T if op == "T" else v, tk)
            else:
                skipped.append(tk)
            continue
        m = re.match(r"spm\.stem\.(\d+)\.", tk)
        if m:
            idx = int(m.group(1))
            conv_map = {0: "stem1", 3: "stem2", 6: "stem3"}
            bn_map = {1: "stem1_bn", 4: "stem2_bn", 7: "stem3_bn"}
            if idx in conv_map and tk.endswith("weight"):
                try_set(params, ["spm", conv_map[idx], "kernel"],
                        v.transpose(2, 3, 1, 0), tk)
            elif idx in bn_map:
                set_bn(["spm", bn_map[idx]], tk.rsplit(".", 1)[0])
            elif tk.endswith("num_batches_tracked"):
                loaded.append(tk)
            else:
                skipped.append(tk)
            continue
        m = re.match(r"spm\.conv(\d)\.(\d)\.", tk)
        if m:
            n, idx = m.group(1), int(m.group(2))
            if idx == 0 and tk.endswith("weight"):
                try_set(params, ["spm", f"conv{n}", "kernel"], v.transpose(2, 3, 1, 0), tk)
            elif idx == 1:
                set_bn(["spm", f"conv{n}_bn"], tk.rsplit(".", 1)[0])
            elif tk.endswith("num_batches_tracked"):
                loaded.append(tk)
            else:
                skipped.append(tk)
            continue
        m = re.match(r"spm\.fc(\d)\.(weight|bias)", tk)
        if m:
            n, leaf = m.group(1), m.group(2)
            val = v.transpose(2, 3, 1, 0) if leaf == "weight" else v
            try_set(params, ["spm", f"fc{n}", "kernel" if leaf == "weight" else "bias"], val, tk)
            continue
        m = re.match(r"interactions\.(\d+)\.injector\.(.*)", tk)
        if m:
            i, rest = m.group(1), m.group(2)
            if rest == "gamma":
                try_set(params, [f"injector{i}_gamma"], v, tk)
            elif rest.startswith("query_norm."):
                try_set(params, [f"injector{i}_qnorm",
                                 "scale" if rest.endswith("weight") else "bias"], v, tk)
            elif rest.startswith("feat_norm."):
                try_set(params, [f"injector{i}_vnorm",
                                 "scale" if rest.endswith("weight") else "bias"], v, tk)
            elif rest.startswith("attn."):
                deform_attn([f"injector{i}"], f"interactions.{i}.injector.attn")
                consumed.update(
                    f"interactions.{i}.injector.attn.{mod}.{leaf}"
                    for mod in ("value_proj", "sampling_offsets", "attention_weights",
                                "output_proj") for leaf in ("weight", "bias")
                )
            else:
                skipped.append(tk)
            continue
        m = re.match(r"interactions\.(\d+)\.extractor\.", tk)
        if m:
            i = m.group(1)
            extractor(f"extractor{i}", f"interactions.{i}.extractor")
            consumed.update(k for k in sd if k.startswith(f"interactions.{i}.extractor."))
            continue
        m = re.match(r"interactions\.(\d+)\.extra_extractors\.(\d)\.", tk)
        if m:
            j = m.group(2)
            extractor(f"extra_extractor{j}",
                      f"interactions.{m.group(1)}.extra_extractors.{j}")
            consumed.update(
                k for k in sd
                if k.startswith(f"interactions.{m.group(1)}.extra_extractors.{j}.")
            )
            continue
        if tk.startswith("up."):
            if tk.endswith("weight"):
                # torch ConvTranspose2d (I, O, kh, kw) -> flax flipped (kh, kw, I, O)
                try_set(params, ["up", "kernel"],
                        np.ascontiguousarray(v.transpose(2, 3, 0, 1)[::-1, ::-1]), tk)
            else:
                try_set(params, ["up", "bias"], v, tk)
            continue
        m = re.match(r"norm(\d)\.", tk)
        if m:
            if tk.endswith("num_batches_tracked"):
                loaded.append(tk)
            else:
                set_bn([f"norm{m.group(1)}"], f"norm{m.group(1)}")
            continue
        if tk in ("cls_token", "mask_token", "norm.weight", "norm.bias") or \
                tk.startswith(("head.", "fc_norm.")):
            loaded.append(tk)  # trunk-checkpoint extras our adapter never uses
            continue
        skipped.append(tk)
    return params, batch_stats, sorted(set(loaded)), sorted(set(skipped))


def _make_try_set(params: Dict[str, Any]):
    import copy

    params = copy.deepcopy(params)
    loaded: List[str] = []
    skipped: List[str] = []

    def try_set(flax_path: List[str], value: np.ndarray, tk: str) -> None:
        node = params
        for k in flax_path[:-1]:
            if k not in node:
                skipped.append(tk)
                return
            node = node[k]
        leaf = flax_path[-1]
        if leaf not in node or tuple(np.shape(node[leaf])) != tuple(value.shape):
            skipped.append(tk)
            return
        node[leaf] = value
        loaded.append(tk)

    return params, loaded, skipped, try_set


def _convT(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (Cin,Cout,kh,kw) -> our ConvTranspose2x
    kernel (kh,kw,Cin,Cout) in flax ConvTranspose convention (spatially
    flipped relative to the direct tap formulation)."""
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def _map_vit_fpn_neck(tk: str, v: np.ndarray, try_set) -> bool:
    """Map the reference 4-branch FPN neck (vit_win_rvsa_v3_wsz7.py:640-656 /
    vit.py:232-247: fpn1 = deconv+Norm2d+GELU+deconv, fpn2 = deconv) onto our
    ViTFPNNeck params.  Returns True when the key was a neck key."""
    table = {
        "fpn1.0.weight": (["neck", "fpn1_deconv1", "kernel"], _convT),
        "fpn1.0.bias": (["neck", "fpn1_deconv1", "bias"], None),
        "fpn1.1.ln.weight": (["neck", "fpn1_norm", "scale"], None),
        "fpn1.1.ln.bias": (["neck", "fpn1_norm", "bias"], None),
        "fpn1.3.weight": (["neck", "fpn1_deconv2", "kernel"], _convT),
        "fpn1.3.bias": (["neck", "fpn1_deconv2", "bias"], None),
        "fpn2.0.weight": (["neck", "fpn2_deconv", "kernel"], _convT),
        "fpn2.0.bias": (["neck", "fpn2_deconv", "bias"], None),
    }
    if tk not in table:
        return False
    path, op = table[tk]
    try_set(path, op(v) if op else v, tk)
    return True


def load_torch_rvsa_backbone(
    state_dict: Mapping[str, Any], params: Dict[str, Any]
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """FULL load of a reference ViT_Win_RVSA_V3_WSZ7 state dict — trunk,
    RVSA sampling nets, both rel-pos systems, and the FPN neck
    (vit_win_rvsa_v3_wsz7.py:196-881) — into our ViTRVSA params.

    Unlike `load_torch_vit_backbone` (non-strict MAE-trunk graft) this maps
    every RVSA-specific parameter, enabling forward-parity testing and
    porting fully-finetuned reference checkpoints."""
    sd = _strip_prefixes(
        {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
         for k, v in state_dict.items()}
    )
    params, loaded, skipped, try_set = _make_try_set(params)

    for tk, v in sd.items():
        if tk in ("cls_token", "mask_token", "norm.weight", "norm.bias"):
            skipped.append(tk)  # final norm is unused (forward_features :785-813)
            continue
        if tk == "pos_embed":
            if "pos_embed" in params and np.shape(params["pos_embed"]) == v.shape:
                params["pos_embed"] = v
                loaded.append(tk)
            else:
                skipped.append(tk)
            continue
        if tk.startswith("patch_embed.proj."):
            if tk.endswith("weight"):
                try_set(["patch_embed", "kernel"], v.transpose(2, 3, 1, 0), tk)
            else:
                try_set(["patch_embed", "bias"], v, tk)
            continue
        if _map_vit_fpn_neck(tk, v, try_set):
            continue
        m = re.match(r"blocks\.(\d+)\.(.*)", tk)
        if m:
            i, rest = m.group(1), m.group(2)
            blk = f"blocks_{i}"
            table = {
                "norm1.weight": ([blk, "norm1", "scale"], None),
                "norm1.bias": ([blk, "norm1", "bias"], None),
                "norm2.weight": ([blk, "norm2", "scale"], None),
                "norm2.bias": ([blk, "norm2", "bias"], None),
                "attn.qkv.weight": ([blk, "attn", "qkv", "kernel"], "T"),
                "attn.qkv.bias": ([blk, "attn", "qkv", "bias"], None),
                "attn.proj.weight": ([blk, "attn", "proj", "kernel"], "T"),
                "attn.proj.bias": ([blk, "attn", "proj", "bias"], None),
                "mlp.fc1.weight": ([blk, "mlp", "lin1", "kernel"], "T"),
                "mlp.fc1.bias": ([blk, "mlp", "lin1", "bias"], None),
                "mlp.fc2.weight": ([blk, "mlp", "lin2", "kernel"], "T"),
                "mlp.fc2.bias": ([blk, "mlp", "lin2", "bias"], None),
                "attn.rel_pos_h": ([blk, "attn", "rel_pos_h"], None),
                "attn.rel_pos_w": ([blk, "attn", "rel_pos_w"], None),
                "attn.relative_position_bias_table": (
                    [blk, "attn", "relative_position_bias_table"], None),
                # sampling nets: Sequential(AvgPool, LeakyReLU, Conv1x1) — only
                # index 2 has params; torch (O,C,1,1) -> flax (1,1,C,O)
                "attn.sampling_offsets.2.weight": (
                    [blk, "attn", "sampling_offsets", "kernel"], "conv1x1"),
                "attn.sampling_offsets.2.bias": (
                    [blk, "attn", "sampling_offsets", "bias"], None),
                "attn.sampling_scales.2.weight": (
                    [blk, "attn", "sampling_scales", "kernel"], "conv1x1"),
                "attn.sampling_scales.2.bias": (
                    [blk, "attn", "sampling_scales", "bias"], None),
                "attn.sampling_angles.2.weight": (
                    [blk, "attn", "sampling_angles", "kernel"], "conv1x1"),
                "attn.sampling_angles.2.bias": (
                    [blk, "attn", "sampling_angles", "bias"], None),
            }
            if rest in table:
                path, op = table[rest]
                if op == "T":
                    v = v.T
                elif op == "conv1x1":
                    v = v.transpose(2, 3, 1, 0)
                try_set(path, v, tk)
            elif rest.endswith("relative_position_index"):
                loaded.append(tk)  # constant buffer, rebuilt on our side
            else:
                skipped.append(tk)
            continue
        skipped.append(tk)
    return params, loaded, skipped


def load_torch_vitseg_backbone(
    state_dict: Mapping[str, Any], params: Dict[str, Any]
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """FULL load of the reference plain-ViT segmentation backbone (ED/backbone/
    vit.py:184-388: trunk + final norm + FPN neck) into our ViTSeg params."""
    sd = _strip_prefixes(
        {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
         for k, v in state_dict.items()}
    )
    params, loaded, skipped, try_set = _make_try_set(params)

    for tk, v in sd.items():
        if tk in ("cls_token", "mask_token"):
            skipped.append(tk)
            continue
        if tk in ("norm.weight", "norm.bias"):
            # ViTSeg DOES apply the final norm before the neck (vit.py:376)
            try_set(["norm", "scale" if tk.endswith("weight") else "bias"], v, tk)
            continue
        if tk == "pos_embed":
            if "pos_embed" in params and np.shape(params["pos_embed"]) == v.shape:
                params["pos_embed"] = v
                loaded.append(tk)
            else:
                skipped.append(tk)
            continue
        if tk.startswith("patch_embed.proj."):
            if tk.endswith("weight"):
                try_set(["patch_embed", "kernel"], v.transpose(2, 3, 1, 0), tk)
            else:
                try_set(["patch_embed", "bias"], v, tk)
            continue
        if _map_vit_fpn_neck(tk, v, try_set):
            continue
        m = re.match(r"blocks\.(\d+)\.(.*)", tk)
        if m:
            i, rest = m.group(1), m.group(2)
            pre = f"blocks_{i}"
            table = {
                "norm1.weight": ([f"{pre}_norm1", "scale"], None),
                "norm1.bias": ([f"{pre}_norm1", "bias"], None),
                "norm2.weight": ([f"{pre}_norm2", "scale"], None),
                "norm2.bias": ([f"{pre}_norm2", "bias"], None),
                "attn.qkv.weight": ([f"{pre}_attn", "qkv", "kernel"], "T"),
                "attn.qkv.bias": ([f"{pre}_attn", "qkv", "bias"], None),
                "attn.proj.weight": ([f"{pre}_attn", "proj", "kernel"], "T"),
                "attn.proj.bias": ([f"{pre}_attn", "proj", "bias"], None),
                "mlp.fc1.weight": ([f"{pre}_mlp", "lin1", "kernel"], "T"),
                "mlp.fc1.bias": ([f"{pre}_mlp", "lin1", "bias"], None),
                "mlp.fc2.weight": ([f"{pre}_mlp", "lin2", "kernel"], "T"),
                "mlp.fc2.bias": ([f"{pre}_mlp", "lin2", "bias"], None),
            }
            if rest in table:
                path, op = table[rest]
                try_set(path, v.T if op == "T" else v, tk)
            else:
                skipped.append(tk)
            continue
        skipped.append(tk)
    return params, loaded, skipped


def detect_backbone_family(sd: Mapping[str, Any]) -> str:
    """Identify which reference backbone family a state dict belongs to."""
    keys = sd.keys() if hasattr(sd, "keys") else sd
    keyset = set(keys)
    if any(".RC." in k or ".NC." in k for k in keyset):
        return "vitae"
    if any(k.startswith("interactions.") or k.startswith("spm.") for k in keyset):
        return "vit_adapter"
    if any(".dcn." in k or k.startswith("patch_embed.conv1.") for k in keyset):
        return "internimage"
    if any(k.startswith("layer1.") or k.startswith("conv1.") for k in keyset):
        return "resnet"
    if any("layers." in k and ".blocks." in k for k in keyset):
        return "swin"
    return "vit"


def load_backbone_checkpoint(path: str, params: Dict[str, Any],
                             batch_stats: Optional[Dict[str, Any]] = None,
                             allow_pickle: bool = False):
    """Load a torch .pth (MAE/IMP/timm/official) into backbone params,
    non-strict, auto-detecting the backbone family (all 7 reference families:
    ViT/RVSA, Swin, ResNet-50, ViTAEv2, InternImage, ViT-Adapter).

    Returns new params, or (params, batch_stats) when `batch_stats` is given
    (required for the BatchNorm-carrying families: resnet/vitae/vit_adapter).

    Tries the safe `weights_only=True` path first; full unpickling (arbitrary
    code execution risk) requires an explicit `allow_pickle=True` opt-in.
    """
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise RuntimeError(
                f"{path} needs full unpickling (weights_only=True failed: {e}); "
                "re-call with allow_pickle=True if you trust this checkpoint"
            ) from e
        import warnings

        warnings.warn(f"unpickling {path} with weights_only=False (allow_pickle)")
        sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "state_dict_ema", "model", "module"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
            break
    sd = _strip_prefixes(
        {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
         for k, v in sd.items()}
    )
    family = detect_backbone_family(sd)
    new_stats = batch_stats
    if family in ("resnet", "vitae", "vit_adapter"):
        if batch_stats is None:
            raise ValueError(
                f"{family} checkpoints carry BatchNorm statistics; pass "
                "batch_stats (from variables['batch_stats'])"
            )
        loader = {
            "resnet": load_torch_resnet_backbone,
            "vitae": load_torch_vitae_backbone,
            "vit_adapter": load_torch_vit_adapter_backbone,
        }[family]
        new_params, new_stats, loaded, skipped = loader(sd, params, batch_stats)
    else:
        loader = {
            "internimage": load_torch_internimage_backbone,
            "swin": load_torch_swin_backbone,
            "vit": load_torch_vit_backbone,
        }[family]
        new_params, loaded, skipped = loader(sd, params)
    print(f"[{family}] loaded {len(loaded)} tensors, skipped {len(skipped)} "
          f"(e.g. {skipped[:5]})")
    if batch_stats is not None:
        return new_params, new_stats
    return new_params
