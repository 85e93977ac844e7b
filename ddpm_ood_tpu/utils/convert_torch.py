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


def _to_flax(t: np.ndarray, kind: str) -> np.ndarray:
    t = np.asarray(t)
    if kind == "conv":
        # (O, I, *k) -> (*k, I, O)
        return np.transpose(t, tuple(range(2, t.ndim)) + (1, 0)) if t.ndim > 1 else t
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


def flax_to_torch_unet(params) -> Dict[str, np.ndarray]:
    """Export Flax UNet params to a monai-generative-style flat state_dict
    (canonical key variants) — the reverse migration path."""
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
