"""Torch checkpoint converter: published sp-uhh/sgmse Lightning .ckpt files ->
this framework's parameter pytrees.

Capability parity with reference C34's load path (enhancement.py:34
``ScoreModel.load_from_checkpoint``): published checkpoints carry their
hyperparameters, a ``state_dict`` whose backbone entries are position-indexed
(``dnn.all_modules.{i}.*`` following the module construction order,
reference ncsnpp.py:107-253), and a ``torch_ema`` state under the ``'ema'``
key whose ``shadow_params`` list is aligned with the trainable-parameter
registration order.

This module re-derives that construction-order walk symbolically (no torch
execution needed) and maps every tensor to the corresponding named parameter
in our Flax modules, with the layout transforms:
  - Linear:  (out, in)          -> (in, out)
  - Conv:    (out, in, kh, kw)  -> (kh, kw, in, out)
  - ConvT:   (in, out, kh, kw)  -> (kh, kw, in, out)  (direct-form equivalent)
  - NIN W:   (in, out)          -> unchanged
  - GroupNorm/BatchNorm weight  -> scale
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

Path = Tuple[str, ...]


def _t_linear(w):
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _t_conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _t_convT(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _set(tree: Dict, path: Path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------------------
# NCSN++ family: construction-order walk (reference ncsnpp.py:107-253)
# ---------------------------------------------------------------------------------------

def ncsnpp_module_walk(
    nf: int = 128,
    ch_mult: Sequence[int] = (1, 1, 2, 2, 2, 2, 2),
    num_res_blocks: int = 2,
    attn_resolutions: Sequence[int] = (16,),
    image_size: int = 256,
    conditional: bool = True,
    embedding_type: str = "fourier",
    resblock_type: str = "biggan",
    progressive: str = "output_skip",
    progressive_input: str = "input_skip",
    progressive_combine: str = "sum",
    **ignored,
) -> List[Tuple[int, str, str]]:
    """Yield (torch_module_index, our_module_name, kind) in construction order."""
    out: List[Tuple[int, str, str]] = []
    idx = 0
    num_resolutions = len(ch_mult)
    all_resolutions = [image_size // (2**i) for i in range(num_resolutions)]

    if embedding_type == "fourier":
        out.append((idx, "fourier", "gfp")); idx += 1
    if conditional:
        out.append((idx, "temb_dense0", "linear")); idx += 1
        out.append((idx, "temb_dense1", "linear")); idx += 1

    out.append((idx, "conv_in", "conv")); idx += 1

    for i_level in range(num_resolutions):
        for i_block in range(num_res_blocks):
            out.append((idx, f"down_{i_level}_block{i_block}", "resblock")); idx += 1
            if all_resolutions[i_level] in attn_resolutions:
                out.append((idx, f"down_{i_level}_attn{i_block}", "attn")); idx += 1
        if i_level != num_resolutions - 1:
            if resblock_type == "ddpm":
                out.append((idx, f"down_{i_level}_downsample", "updown")); idx += 1
            else:
                out.append((idx, f"down_{i_level}_downres", "resblock")); idx += 1
            if progressive_input == "input_skip":
                out.append((idx, f"down_{i_level}_combine", "combine")); idx += 1
            elif progressive_input == "residual":
                out.append((idx, f"down_{i_level}_pyramid_down", "firconv")); idx += 1

    out.append((idx, "mid_block0", "resblock")); idx += 1
    out.append((idx, "mid_attn", "attn")); idx += 1
    out.append((idx, "mid_block1", "resblock")); idx += 1

    for i_level in reversed(range(num_resolutions)):
        for i_block in range(num_res_blocks + 1):
            out.append((idx, f"up_{i_level}_block{i_block}", "resblock")); idx += 1
        if all_resolutions[i_level] in attn_resolutions:
            out.append((idx, f"up_{i_level}_attn", "attn")); idx += 1
        if progressive != "none":
            if i_level == num_resolutions - 1:
                out.append((idx, f"up_{i_level}_pyramid_norm", "groupnorm")); idx += 1
                out.append((idx, f"up_{i_level}_pyramid_conv", "conv")); idx += 1
            else:
                if progressive == "output_skip":
                    out.append((idx, f"up_{i_level}_pyramid_norm", "groupnorm")); idx += 1
                    out.append((idx, f"up_{i_level}_pyramid_conv", "conv")); idx += 1
                elif progressive == "residual":
                    out.append((idx, f"up_{i_level}_pyramid_up", "firconv")); idx += 1
        if i_level != 0:
            if resblock_type == "ddpm":
                out.append((idx, f"up_{i_level}_upsample", "updown")); idx += 1
            else:
                out.append((idx, f"up_{i_level}_upres", "resblock")); idx += 1

    if progressive != "output_skip":
        out.append((idx, "out_norm", "groupnorm")); idx += 1
        out.append((idx, "out_conv", "conv")); idx += 1
    return out


def _expand_kind(prefix: str, name: str, kind: str, sd: Dict[str, np.ndarray],
                 params: Dict) -> List[str]:
    """Copy all tensors of torch module `prefix` (e.g. 'all_modules.7') into our
    `params` tree under module `name`. Returns the consumed torch keys."""
    used = []

    def take(suffix):
        key = f"{prefix}.{suffix}"
        if key in sd:
            used.append(key)
            return np.asarray(sd[key])
        return None

    if kind == "gfp":
        _set(params, (name, "W"), take("W"))
    elif kind == "linear":
        _set(params, (name, "Dense_0", "kernel"), _t_linear(take("weight")))
        _set(params, (name, "Dense_0", "bias"), take("bias"))
    elif kind == "conv":
        _set(params, (name, "Conv_0", "kernel"), _t_conv(take("weight")))
        b = take("bias")
        if b is not None:
            _set(params, (name, "Conv_0", "bias"), b)
    elif kind == "groupnorm":
        _set(params, (name, "scale"), take("weight"))
        _set(params, (name, "bias"), take("bias"))
    elif kind == "attn":
        _set(params, (name, "GroupNorm_0", "scale"), take("GroupNorm_0.weight"))
        _set(params, (name, "GroupNorm_0", "bias"), take("GroupNorm_0.bias"))
        for k in range(4):
            _set(params, (name, f"NIN_{k}", "W"), take(f"NIN_{k}.W"))
            _set(params, (name, f"NIN_{k}", "b"), take(f"NIN_{k}.b"))
    elif kind == "resblock":
        _set(params, (name, "GroupNorm_0", "scale"), take("GroupNorm_0.weight"))
        _set(params, (name, "GroupNorm_0", "bias"), take("GroupNorm_0.bias"))
        _set(params, (name, "Conv_0", "Conv_0", "kernel"), _t_conv(take("Conv_0.weight")))
        _set(params, (name, "Conv_0", "Conv_0", "bias"), take("Conv_0.bias"))
        w = take("Dense_0.weight")
        if w is not None:
            _set(params, (name, "Dense_0", "Dense_0", "kernel"), _t_linear(w))
            _set(params, (name, "Dense_0", "Dense_0", "bias"), take("Dense_0.bias"))
        _set(params, (name, "GroupNorm_1", "scale"), take("GroupNorm_1.weight"))
        _set(params, (name, "GroupNorm_1", "bias"), take("GroupNorm_1.bias"))
        _set(params, (name, "Conv_1", "Conv_0", "kernel"), _t_conv(take("Conv_1.weight")))
        _set(params, (name, "Conv_1", "Conv_0", "bias"), take("Conv_1.bias"))
        w = take("Conv_2.weight")  # BigGAN 1x1 shortcut
        if w is not None:
            _set(params, (name, "Conv_2", "Conv_0", "kernel"), _t_conv(w))
            _set(params, (name, "Conv_2", "Conv_0", "bias"), take("Conv_2.bias"))
        w = take("NIN_0.W")  # DDPM-style NIN shortcut
        if w is not None:
            _set(params, (name, "NIN_0", "W"), w)
            _set(params, (name, "NIN_0", "b"), take("NIN_0.b"))
    elif kind == "combine":
        _set(params, (name, "Conv_0", "Conv_0", "kernel"), _t_conv(take("Conv_0.weight")))
        _set(params, (name, "Conv_0", "Conv_0", "bias"), take("Conv_0.bias"))
    elif kind == "firconv":
        _set(params, (name, "Conv2d_0", "weight"), _t_conv(take("Conv2d_0.weight")))
        _set(params, (name, "Conv2d_0", "bias"), take("Conv2d_0.bias"))
    elif kind == "updown":
        _set(params, (name, "Conv_0", "Conv_0", "kernel"), _t_conv(take("Conv_0.weight")))
        _set(params, (name, "Conv_0", "Conv_0", "bias"), take("Conv_0.bias"))
    else:
        raise ValueError(f"unknown kind {kind}")
    return used


def convert_ncsnpp_state_dict(sd: Dict[str, np.ndarray], **config
                              ) -> Dict[str, Any]:
    """Convert a torch NCSN++(-v2/-48k) backbone state_dict (keys
    ``all_modules.{i}.*`` + ``output_layer.*``) to our Flax params tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    used = set()
    for idx, name, kind in ncsnpp_module_walk(**config):
        used.update(_expand_kind(f"all_modules.{idx}", name, kind, sd, params))
    _set(params, ("output_layer", "kernel"), _t_conv(sd["output_layer.weight"]))
    _set(params, ("output_layer", "bias"), sd["output_layer.bias"])
    used.update(["output_layer.weight", "output_layer.bias"])
    missed = [k for k in sd if k not in used]
    if missed:
        raise ValueError(f"unconverted torch keys: {missed[:10]} (+{max(0, len(missed)-10)} more)")
    return params


# ---------------------------------------------------------------------------------------
# DCUNet conversion
# ---------------------------------------------------------------------------------------

def convert_dcunet_state_dict(sd: Dict[str, np.ndarray],
                              dcunet_architecture: str = "DilDCUNet-v2",
                              dcunet_time_embedding: str = "gfp",
                              dcunet_temb_layers_global: int = 2,
                              **config) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torch DCUNet state_dict to (params, batch_stats) trees."""
    from .models.dcunet import DCUNET_ARCHITECTURES

    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def maybe(key):
        if key in sd:
            used.add(key)
            return sd[key]
        return None

    # global embedding: embed.0 = GFP/DS, then pairs (ComplexLinear, OnReIm act)
    if dcunet_time_embedding != "none":
        w = maybe("embed.0.W")
        if w is not None:
            name = "embed_gfp" if dcunet_time_embedding == "gfp" else "embed_ds"
            _set(params, (name, "W"), w)
        for i in range(dcunet_temb_layers_global):
            tidx = 1 + 2 * i  # Sequential: [GFP, (Lin, Act), (Lin, Act), ...]
            for part in ("re", "im"):
                _set(params, (f"embed_global{i}", part, "kernel"),
                     _t_linear(take(f"embed.{tidx}.{part}.weight")))
                _set(params, (f"embed_global{i}", part, "bias"),
                     take(f"embed.{tidx}.{part}.bias"))

    def convert_complex_conv(tprefix, mypath, transposed=False):
        tf = _t_convT if transposed else _t_conv
        for part in ("re", "im"):
            tkey = f"{tprefix}.{part}_module.weight"
            if transposed:
                _set(params, mypath + (f"{part}_kernel",), tf(take(tkey)))
                b = maybe(f"{tprefix}.{part}_module.bias")
                if b is not None:
                    _set(params, mypath + (f"{part}_bias",), b)
            else:
                _set(params, mypath + (part, "kernel"), tf(take(tkey)))
                b = maybe(f"{tprefix}.{part}_module.bias")
                if b is not None:
                    _set(params, mypath + (part, "bias"), b)

    def convert_norm(tprefix, mypath):
        # bN: OnReIm(BatchNorm): re_module/im_module with weight/bias + running stats
        if f"{tprefix}.re_module.weight" in sd:
            for part in ("re", "im"):
                _set(params, mypath + (part, "scale"), take(f"{tprefix}.{part}_module.weight"))
                _set(params, mypath + (part, "bias"), take(f"{tprefix}.{part}_module.bias"))
                _set(stats, mypath + (part, "mean"), take(f"{tprefix}.{part}_module.running_mean"))
                _set(stats, mypath + (part, "var"), take(f"{tprefix}.{part}_module.running_var"))
                maybe(f"{tprefix}.{part}_module.num_batches_tracked")
        else:  # CbN
            for p in ("Wrr", "Wri", "Wii", "Br", "Bi"):
                _set(params, mypath + (p,), take(f"{tprefix}.{p}"))

    def convert_embed_layer(tprefix, mypath, temb_layers):
        # Sequential: (temb_layers-1) x [ComplexLinear, OnReIm], FeatureMapDense, OnReIm
        for i in range(max(0, temb_layers - 1)):
            tidx = 2 * i
            for part in ("re", "im"):
                _set(params, mypath + (f"lin{i}", part, "kernel"),
                     _t_linear(take(f"{tprefix}.{tidx}.{part}.weight")))
                _set(params, mypath + (f"lin{i}", part, "bias"),
                     take(f"{tprefix}.{tidx}.{part}.bias"))
        fidx = 2 * max(0, temb_layers - 1)
        for part in ("re", "im"):
            _set(params, mypath + ("feature_dense", part, "kernel"),
                 _t_linear(take(f"{tprefix}.{fidx}.dense.{part}.weight")))
            _set(params, mypath + ("feature_dense", part, "bias"),
                 take(f"{tprefix}.{fidx}.dense.{part}.bias"))

    conf_encoders, conf_decoders = DCUNET_ARCHITECTURES[dcunet_architecture]
    n_enc = len(conf_encoders)
    n_dec = len(conf_decoders) - 1
    temb_local = config.get("dcunet_temb_layers_local", 1)

    for i in range(n_enc):
        convert_complex_conv(f"encoders.{i}.conv", (f"encoder{i}", "conv"))
        convert_norm(f"encoders.{i}.norm", (f"encoder{i}", "norm"))
        if dcunet_time_embedding != "none":
            convert_embed_layer(f"encoders.{i}.embed_layer",
                                (f"encoder{i}", "embed_layer"), temb_local)
    for i in range(n_dec):
        convert_complex_conv(f"decoders.{i}.deconv", (f"decoder{i}", "deconv"),
                             transposed=True)
        convert_norm(f"decoders.{i}.norm", (f"decoder{i}", "norm"))
        if dcunet_time_embedding != "none":
            convert_embed_layer(f"decoders.{i}.embed_layer",
                                (f"decoder{i}", "embed_layer"), temb_local)
    convert_complex_conv("output_layer", ("output_layer",), transposed=True)

    missed = [k for k in sd if k not in used]
    if missed:
        raise ValueError(f"unconverted torch keys: {missed[:10]} (+{max(0, len(missed)-10)} more)")
    return params, stats


# ---------------------------------------------------------------------------------------
# Full Lightning checkpoint conversion
# ---------------------------------------------------------------------------------------

def convert_lightning_checkpoint(ckpt_path: str, out_path: Optional[str] = None):
    """Convert a published sp-uhh/sgmse Lightning .ckpt into this framework's
    checkpoint format (Orbax tree + embedded config). Returns (model, variables).

    The .ckpt embeds its hyper_parameters (reference model.py:87), so no extra
    config is needed; EMA shadow_params are re-associated with parameter names
    via registration order and stored as the eval weights.
    """
    import torch

    from .checkpoint import save_checkpoint
    from .model import ScoreModel

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    hparams = dict(ckpt.get("hyper_parameters", {}))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in ckpt["state_dict"].items()
          if not k.startswith("pesq_loss.")}
    dnn_sd = {k[len("dnn."):]: v for k, v in sd.items() if k.startswith("dnn.")}

    backbone = hparams.get("backbone", "ncsnpp")
    sde = hparams.get("sde", "ouve")
    model = ScoreModel(backbone, sde,
                       **{k: v for k, v in hparams.items()
                          if k not in ("backbone", "sde", "data_module_cls",
                                       "no_wandb", "gpu", "gpus")})

    batch_stats: Dict[str, Any] = {}
    if backbone == "dcunet":
        params, batch_stats = convert_dcunet_state_dict(dnn_sd, **hparams)
    else:
        params = convert_ncsnpp_state_dict(dnn_sd, **hparams)

    # EMA: shadow_params are ordered like trainable named_parameters
    # (requires_grad=True, i.e. everything except the fourier/GFP W buffers).
    ema_params = None
    ema_state = ckpt.get("ema")
    if ema_state and "shadow_params" in ema_state:
        shadow = [np.asarray(t) for t in ema_state["shadow_params"]]
        trainable = [k for k in sd
                     if not k.endswith(("running_mean", "running_var",
                                        "num_batches_tracked"))
                     and not _is_fourier_w(k)]
        if len(shadow) == len(trainable):
            ema_sd = dict(sd)
            for k, v in zip(trainable, shadow):
                ema_sd[k] = v
            ema_dnn = {k[len("dnn."):]: v for k, v in ema_sd.items()
                       if k.startswith("dnn.")}
            if backbone == "dcunet":
                ema_params, _ = convert_dcunet_state_dict(ema_dnn, **hparams)
            else:
                ema_params = convert_ncsnpp_state_dict(ema_dnn, **hparams)
        else:
            import warnings
            warnings.warn(
                f"EMA shadow_params count {len(shadow)} != trainable params "
                f"{len(trainable)}; skipping EMA conversion.")

    state_tree = {
        "step": np.asarray(ckpt.get("global_step", 0), np.int32),
        "params": params,
        "ema_params": ema_params if ema_params is not None else params,
        "num_updates": np.asarray(ckpt.get("global_step", 0), np.int32),
    }
    if batch_stats:
        state_tree["model_state"] = {"batch_stats": batch_stats}
    if out_path is not None:
        save_checkpoint(out_path, state_tree, model.config_dict())

    variables = {"params": state_tree["ema_params"]}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return model, variables


def _is_fourier_w(key: str) -> bool:
    """GFP projection W buffers (requires_grad=False in the reference)."""
    return key.endswith(".W") and ("all_modules.0" in key or "embed.0" in key)


def _main():
    """CLI: python -m sgmse_tpu.convert <lightning.ckpt> <out_dir>

    Converts a published torch Lightning checkpoint into an Orbax checkpoint
    directory loadable with checkpoint.load_score_model (EMA weights included).
    """
    import argparse

    parser = argparse.ArgumentParser(
        description="Convert a sp-uhh/sgmse Lightning .ckpt to an Orbax "
                    "checkpoint for this framework.")
    parser.add_argument("ckpt", help="Path to the torch Lightning .ckpt file")
    parser.add_argument("out", help="Output checkpoint directory")
    args = parser.parse_args()
    model, _ = convert_lightning_checkpoint(args.ckpt, out_path=args.out)
    print(f"Converted {args.ckpt} -> {args.out} "
          f"(backbone={model.backbone}, sde={model.sde_name})")


if __name__ == "__main__":
    _main()
