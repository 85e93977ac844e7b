"""Convert reference (torch / monai-generative) UNet checkpoints <-> Flax params.

Migration path for users of the reference repo: a DiffusionModelUNet trained with
marksgraham/ddpm-ood (checkpoint schema at reference src/trainers/base.py:166-187,
model instantiated from generative.networks.nets.DiffusionModelUNet at
base.py:65-88) can be converted into this framework's Orbax checkpoint layout and
driven through reconstruct.py / ood_detection.py unchanged — and back, so models
trained here can be inspected with the reference tooling.

Key-space: this framework's Flax module names deliberately mirror
monai-generative's state_dict naming (time_embed.0 <-> time_embed_0,
down_blocks.{L}.resnets.{j}.conv1 <-> down_{L}_res_{j}/conv1, ...). Where
monai-generative wraps convs in monai's `Convolution` (adding a `.conv` segment)
or has shifted names across versions (`to_q` vs `query`, `downsampler.op` vs
`downsampler.conv`), every target accepts a list of CANDIDATE torch prefixes and
the report lists anything unmatched — run with report printing before trusting a
conversion from an unseen version.

Tensor layout transforms (verified numerically in tests/test_convert_torch.py):
  conv   torch (O, I, *k)  <-> flax (*k, I, O)
  linear torch (O, I)      <-> flax (I, O)
  norm   torch weight/bias <-> flax scale/bias (unchanged)

Padding parity note: torch Conv(k=3, s=2, padding=1) does NOT equal XLA
padding="SAME" (SAME pads (0,1) at stride 2, shifting windows); the UNet's
Downsample uses explicit (1,1) padding so converted weights are window-exact.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Tuple

import numpy as np

# leaf kind -> (flax leaf name -> torch leaf name)
_LEAF_NAMES = {
    "conv": {"kernel": "weight", "bias": "bias"},
    "linear": {"kernel": "weight", "bias": "bias"},
    "norm": {"scale": "weight", "bias": "bias"},
}

# submodule layout of this framework's ResnetBlock / AttentionBlock /
# Down/Upsample, with candidate torch sub-prefixes (first = canonical, used
# for export)
_RES_SUBMODULES = {
    "norm1": (["norm1"], "norm"),
    "conv1": (["conv1.conv", "conv1"], "conv"),
    "time_emb_proj": (["time_emb_proj"], "linear"),
    "norm2": (["norm2"], "norm"),
    "conv2": (["conv2.conv", "conv2"], "conv"),
    "skip_connection": (["skip_connection.conv", "skip_connection"], "conv"),
}
_ATTN_SUBMODULES = {
    "norm": (["norm"], "norm"),
    "to_q": (["to_q", "query"], "linear"),
    "to_k": (["to_k", "key"], "linear"),
    "to_v": (["to_v", "value"], "linear"),
    "proj_attn": (["proj_attn", "proj_out", "proj"], "linear"),
}
_DOWNSAMPLE_SUBMODULES = {
    "conv": (["downsampler.op.conv", "downsampler.op", "downsampler.conv"], "conv"),
}
_UPSAMPLE_SUBMODULES = {
    "conv": (["upsampler.conv.conv", "upsampler.conv", "upsampler.op.conv"], "conv"),
}


def _module_spec(name: str) -> Tuple[List[str], Dict[str, Tuple[List[str], str]]]:
    """(candidate torch prefixes, submodule map) for one top-level flax module."""
    if name == "time_embed_0":
        return ["time_embed.0"], {"": ([""], "linear")}
    if name == "time_embed_2":
        return ["time_embed.2"], {"": ([""], "linear")}
    if name == "conv_in":
        return ["conv_in.conv", "conv_in"], {"": ([""], "conv")}
    if name == "conv_out":
        return ["out.2.conv", "out.2"], {"": ([""], "conv")}
    if name == "norm_out":
        return ["out.0"], {"": ([""], "norm")}
    if name == "mid_res_0":
        return ["middle_block.resnet_1", "middle_block.resnets.0"], _RES_SUBMODULES
    if name == "mid_res_1":
        return ["middle_block.resnet_2", "middle_block.resnets.1"], _RES_SUBMODULES
    if name == "mid_attn":
        return (
            ["middle_block.attention", "middle_block.attn",
             "middle_block.attentions.0"],
            _ATTN_SUBMODULES,
        )
    parts = name.split("_")
    if parts[0] == "down" and parts[2] == "res":
        return [f"down_blocks.{parts[1]}.resnets.{parts[3]}"], _RES_SUBMODULES
    if parts[0] == "down" and parts[2] == "attn":
        return [f"down_blocks.{parts[1]}.attentions.{parts[3]}"], _ATTN_SUBMODULES
    if parts[0] == "down" and parts[2] == "downsample":
        return [f"down_blocks.{parts[1]}"], _DOWNSAMPLE_SUBMODULES
    if parts[0] == "up" and parts[2] == "res":
        return [f"up_blocks.{parts[1]}.resnets.{parts[3]}"], _RES_SUBMODULES
    if parts[0] == "up" and parts[2] == "attn":
        return [f"up_blocks.{parts[1]}.attentions.{parts[3]}"], _ATTN_SUBMODULES
    if parts[0] == "up" and parts[2] == "upsample":
        return [f"up_blocks.{parts[1]}"], _UPSAMPLE_SUBMODULES
    raise KeyError(f"No torch mapping for UNet module {name!r}")


def _flip_spatial(t: np.ndarray, n_spatial: int) -> np.ndarray:
    return t[tuple(slice(None, None, -1) for _ in range(n_spatial))].copy()


def _to_flax(t: np.ndarray, kind: str) -> np.ndarray:
    t = np.asarray(t)
    if kind == "conv":
        # (O, I, *k) -> (*k, I, O)
        return np.transpose(t, tuple(range(2, t.ndim)) + (1, 0)) if t.ndim > 1 else t
    if kind == "convtranspose":
        # torch ConvTranspose (I, O, *k) -> lhs-dilated-conv kernel (*k, I, O)
        # with the spatial taps FLIPPED (verified vs torch conv_transpose2d in
        # tests/test_convert_torch.py — transpose alone is numerically wrong)
        if t.ndim > 1:
            t = np.transpose(t, tuple(range(2, t.ndim)) + (0, 1))
            t = _flip_spatial(t, t.ndim - 2)
        return t
    if kind == "linear":
        return t.T if t.ndim == 2 else t
    return t


def _to_torch(t: np.ndarray, kind: str) -> np.ndarray:
    t = np.asarray(t)
    if kind == "conv":
        # (*k, I, O) -> (O, I, *k)
        return (
            np.transpose(t, (t.ndim - 1, t.ndim - 2) + tuple(range(t.ndim - 2)))
            if t.ndim > 1
            else t
        )
    if kind == "convtranspose":
        if t.ndim > 1:
            t = _flip_spatial(t, t.ndim - 2)
            t = np.transpose(t, (t.ndim - 2, t.ndim - 1) + tuple(range(t.ndim - 2)))
        return t
    if kind == "linear":
        return t.T if t.ndim == 2 else t
    return t


def torch_to_flax_unet(
    torch_state: Mapping[str, np.ndarray], params_template
) -> Tuple[dict, dict]:
    """Map a reference UNet state_dict onto `params_template`'s tree.

    `torch_state`: flat {key: array-like} (torch tensors or numpy).
    Returns (params, report); report = {"matched": n, "missing": [flax paths the
    torch dict lacked], "unused": [torch keys not consumed]}. Shapes are checked
    leaf-by-leaf — a wrong-architecture checkpoint fails loudly, not silently.
    """
    flat_torch = {k: np.asarray(v) for k, v in torch_state.items()}
    used = set()
    missing: List[str] = []
    out: dict = {}
    matched = 0

    for mod_name, leaves in params_template.items():
        prefixes, submods = _module_spec(mod_name)
        # leaves: either {leaf: array} for plain conv/dense modules or
        # {submodule: {leaf: array}} for res/attn blocks
        def convert_leaf(sub_flax: str, leaf: str, template_leaf):
            nonlocal matched
            subs, kind = submods[sub_flax]
            tname = _LEAF_NAMES[kind][leaf]
            for prefix in prefixes:
                for sub in subs:
                    key = ".".join(p for p in (prefix, sub, tname) if p)
                    if key in flat_torch:
                        arr = _to_flax(flat_torch[key], kind)
                        if arr.shape != template_leaf.shape:
                            raise ValueError(
                                f"{key}: converted shape {arr.shape} != expected "
                                f"{template_leaf.shape} for {mod_name}/{sub_flax}/{leaf}"
                            )
                        used.add(key)
                        matched += 1
                        return arr.astype(np.asarray(template_leaf).dtype)
            missing.append(f"{mod_name}/{sub_flax}/{leaf}".replace("//", "/"))
            return np.asarray(template_leaf)

        first = next(iter(leaves.values()))
        if isinstance(first, Mapping):  # res / attn blocks
            out[mod_name] = {
                sub: {
                    leaf: convert_leaf(sub, leaf, tl) for leaf, tl in subleaves.items()
                }
                for sub, subleaves in leaves.items()
            }
        else:  # plain conv / dense / norm module
            sub = "conv" if "conv" in submods else ""
            out[mod_name] = {
                leaf: convert_leaf(sub, leaf, tl) for leaf, tl in leaves.items()
            }

    unused = sorted(set(flat_torch) - used)
    return out, {"matched": matched, "missing": missing, "unused": unused}


# ---------------------------------------------------------------------------
# VQVAE (monai-generative generative.networks.nets.VQVAE, reference
# vqvae_trainer.py:50-70). torch module layout: encoder/decoder are flat
# `blocks` ModuleLists interleaving monai Convolution (weights at `.conv`),
# VQVAEResidualUnit (`.conv1.conv` / `.conv2.conv`), and transposed
# Convolution in the decoder; the EMA quantizer lives at
# quantizer.quantizer.{embedding.weight, ema_cluster_size, ema_w}.
# This framework's tree (models/vqvae.py): encoder/Conv_{i} (strided per level
# + final to-embedding conv), encoder/VQVAEResidualUnit_{level*R+j}, decoder
# mirrored with ConvTransposeTorchLike_{i}; quantizer state in the "ema"
# collection as {embedding, cluster_size, embed_avg}.
# ---------------------------------------------------------------------------


def _vqvae_plan(params_template) -> List[Tuple[Tuple[str, str], List[str], str]]:
    """[(flax (module, submodule-or-'') path, torch key prefixes, kind)] for
    every conv-carrying module, derived from the template's structure."""
    plan: List[Tuple[Tuple[str, str], List[str], str]] = []

    def _num(name: str) -> int:
        return int(name.rsplit("_", 1)[1])

    for side in ("encoder", "decoder"):
        mods = params_template[side]
        convs = sorted((n for n in mods if n.startswith("Conv_")), key=_num)
        res = sorted((n for n in mods if "ResidualUnit" in n), key=_num)
        trans = sorted((n for n in mods if "ConvTranspose" in n), key=_num)
        if side == "encoder":
            n_levels = len(convs) - 1  # strided per level + final embedding conv
        else:
            n_levels = len(trans)
        r = len(res) // max(n_levels, 1)

        def block_key(b: int) -> str:
            return f"{side}.blocks.{b}"

        if side == "encoder":
            for i, conv in enumerate(convs):
                b = i * (r + 1)  # strided conv opens each level; final lands after
                plan.append(((side, conv), [block_key(b) + ".conv"], "conv"))
            for k, unit in enumerate(res):
                level, j = divmod(k, max(r, 1))
                b = level * (r + 1) + 1 + j
                plan.append(
                    ((side, unit + "/Conv_0"), [block_key(b) + ".conv1.conv"], "conv")
                )
                plan.append(
                    ((side, unit + "/Conv_1"), [block_key(b) + ".conv2.conv"], "conv")
                )
        else:
            plan.append(((side, convs[0]), [block_key(0) + ".conv"], "conv"))
            for k, unit in enumerate(res):
                level, j = divmod(k, max(r, 1))
                b = 1 + level * (r + 1) + j
                plan.append(
                    ((side, unit + "/Conv_0"), [block_key(b) + ".conv1.conv"], "conv")
                )
                plan.append(
                    ((side, unit + "/Conv_1"), [block_key(b) + ".conv2.conv"], "conv")
                )
            for i, tr in enumerate(trans):
                b = 1 + i * (r + 1) + r
                plan.append(((side, tr), [block_key(b) + ".conv"], "convtranspose"))
    return plan


_QUANTIZER_KEYS = {
    "embedding": (["quantizer.quantizer.embedding.weight",
                   "quantizer.embedding.weight"], "norm"),
    "cluster_size": (["quantizer.quantizer.ema_cluster_size",
                      "quantizer.ema_cluster_size"], "norm"),
    "embed_avg": (["quantizer.quantizer.ema_w", "quantizer.ema_w"], "norm"),
}


def torch_to_flax_vqvae(
    torch_state: Mapping[str, np.ndarray], params_template, ema_template
) -> Tuple[dict, dict, dict]:
    """Map a reference VQVAE state_dict onto (params, ema) templates.

    Returns (params, ema, report) — report as in torch_to_flax_unet."""
    flat = {k: np.asarray(v) for k, v in torch_state.items()}
    used, missing = set(), []
    matched = 0

    def pick(prefixes: List[str], suffixes: List[str], kind, template_leaf, label):
        nonlocal matched
        for p in prefixes:
            for s in suffixes:
                key = f"{p}.{s}" if s else p
                if key in flat:
                    arr = _to_flax(flat[key], kind)
                    if arr.shape != np.asarray(template_leaf).shape:
                        raise ValueError(
                            f"{key}: converted shape {arr.shape} != expected "
                            f"{np.asarray(template_leaf).shape} for {label}"
                        )
                    used.add(key)
                    matched += 1
                    return arr.astype(np.asarray(template_leaf).dtype)
        missing.append(label)
        return np.asarray(template_leaf)

    params = jax_tree_to_dict(params_template)
    for (side, path), prefixes, kind in _vqvae_plan(params_template):
        node = params[side]
        parts = path.split("/")
        for part in parts[:-1]:
            node = node[part]
        leaf_mod = parts[-1]
        node[leaf_mod] = {
            "kernel": pick(prefixes, ["weight"], kind,
                           node[leaf_mod]["kernel"], f"{side}/{path}/kernel"),
            "bias": pick(prefixes, ["bias"], "norm",
                         node[leaf_mod]["bias"], f"{side}/{path}/bias"),
        }

    ema = jax_tree_to_dict(ema_template)
    for leaf, (cands, kind) in _QUANTIZER_KEYS.items():
        ema["quantizer"][leaf] = pick(
            cands, [""], kind, ema["quantizer"][leaf], f"quantizer/{leaf}"
        )

    unused = sorted(set(flat) - used)
    return params, ema, {"matched": matched, "missing": missing, "unused": unused}


def flax_to_torch_vqvae(params, ema) -> Dict[str, np.ndarray]:
    """Export (params, ema) to a monai-generative-style VQVAE state_dict."""
    out: Dict[str, np.ndarray] = {}
    for (side, path), prefixes, kind in _vqvae_plan(params):
        node = params[side]
        for part in path.split("/"):
            node = node[part]
        out[prefixes[0] + ".weight"] = _to_torch(np.asarray(node["kernel"]), kind)
        out[prefixes[0] + ".bias"] = np.asarray(node["bias"])
    for leaf, (cands, kind) in _QUANTIZER_KEYS.items():
        out[cands[0]] = np.asarray(ema["quantizer"][leaf])
    return out


def jax_tree_to_dict(tree):
    """Deep-copy a (possibly frozen) nested mapping into plain mutable dicts,
    keeping leaves as-is."""
    if isinstance(tree, Mapping):
        return {k: jax_tree_to_dict(v) for k, v in tree.items()}
    return tree


def flax_to_torch_unet(params) -> Dict[str, np.ndarray]:
    """Export Flax UNet params to a monai-generative-style flat state_dict
    (canonical key variants) — the reverse migration path.

    CAVEAT: each module emits the FIRST key-name candidate of the same
    alternatives the import direction accepts (e.g. ``conv1.conv.weight``,
    ``middle_block.resnet_1``). These follow monai-generative 0.2.x naming;
    monai-generative is not installable in this environment, so they have not
    been checked against a live ``DiffusionModelUNet().state_dict()``. If a
    different release renames modules, load the exported ``.pth`` with
    ``strict=False`` and map stragglers using the import side's per-key
    mismatch report (torch_to_flax_unet's unmatched-keys output) as the
    ground truth for this framework's expectations."""
    out: Dict[str, np.ndarray] = {}
    for mod_name, leaves in params.items():
        prefixes, submods = _module_spec(mod_name)

        def export_leaf(sub_flax: str, leaf: str, value):
            subs, kind = submods[sub_flax]
            tname = _LEAF_NAMES[kind][leaf]
            key = ".".join(p for p in (prefixes[0], subs[0], tname) if p)
            out[key] = _to_torch(np.asarray(value), kind)

        first = next(iter(leaves.values()))
        if isinstance(first, Mapping):
            for sub, subleaves in leaves.items():
                for leaf, v in subleaves.items():
                    export_leaf(sub, leaf, v)
        else:
            sub = "conv" if "conv" in submods else ""
            for leaf, v in leaves.items():
                export_leaf(sub, leaf, v)
    return out
