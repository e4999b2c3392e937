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
# Reverse direction: our params -> torch state_dict (export)
# ---------------------------------------------------------------------------------------

def _ti_linear(w):
    """(in, out) -> torch Linear (out, in)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


def _ti_conv(w):
    """(kh, kw, in, out) -> torch Conv (out, in, kh, kw)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _ti_convT(w):
    """(kh, kw, in, out) -> torch ConvTranspose (in, out, kh, kw)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 0, 1)))


class _TreeReader:
    """Reads leaves out of a nested params dict, tracking consumption so the
    exporter can prove it visited every parameter (mirror of the converter's
    unconverted-torch-keys check)."""

    def __init__(self, tree: Dict):
        self.tree = tree
        self.consumed: set = set()

    def get(self, path: Path):
        node = self.tree
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        self.consumed.add(path)
        return np.asarray(node)

    def unconsumed(self) -> List[Path]:
        out = []

        def walk(node, prefix):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, prefix + (k,))
            elif prefix not in self.consumed:
                out.append(prefix)

        walk(self.tree, ())
        return out


def _collect_kind(prefix: str, name: str, kind: str, reader: _TreeReader,
                  sd: Dict[str, np.ndarray]) -> None:
    """Inverse of `_expand_kind`: copy our module `name`'s tensors into torch
    keys under `prefix` (e.g. 'all_modules.7')."""

    def put(suffix, value):
        if value is not None:
            sd[f"{prefix}.{suffix}"] = value

    def g(*path):
        return reader.get((name,) + path)

    if kind == "gfp":
        put("W", g("W"))
    elif kind == "linear":
        put("weight", _ti_linear(g("Dense_0", "kernel")))
        put("bias", g("Dense_0", "bias"))
    elif kind == "conv":
        put("weight", _ti_conv(g("Conv_0", "kernel")))
        b = g("Conv_0", "bias")
        put("bias", b)
    elif kind == "groupnorm":
        put("weight", g("scale"))
        put("bias", g("bias"))
    elif kind == "attn":
        put("GroupNorm_0.weight", g("GroupNorm_0", "scale"))
        put("GroupNorm_0.bias", g("GroupNorm_0", "bias"))
        for k in range(4):
            put(f"NIN_{k}.W", g(f"NIN_{k}", "W"))
            put(f"NIN_{k}.b", g(f"NIN_{k}", "b"))
    elif kind == "resblock":
        put("GroupNorm_0.weight", g("GroupNorm_0", "scale"))
        put("GroupNorm_0.bias", g("GroupNorm_0", "bias"))
        put("Conv_0.weight", _ti_conv(g("Conv_0", "Conv_0", "kernel")))
        put("Conv_0.bias", g("Conv_0", "Conv_0", "bias"))
        w = g("Dense_0", "Dense_0", "kernel")
        if w is not None:
            put("Dense_0.weight", _ti_linear(w))
            put("Dense_0.bias", g("Dense_0", "Dense_0", "bias"))
        put("GroupNorm_1.weight", g("GroupNorm_1", "scale"))
        put("GroupNorm_1.bias", g("GroupNorm_1", "bias"))
        put("Conv_1.weight", _ti_conv(g("Conv_1", "Conv_0", "kernel")))
        put("Conv_1.bias", g("Conv_1", "Conv_0", "bias"))
        w = g("Conv_2", "Conv_0", "kernel")  # BigGAN 1x1 shortcut
        if w is not None:
            put("Conv_2.weight", _ti_conv(w))
            put("Conv_2.bias", g("Conv_2", "Conv_0", "bias"))
        w = g("NIN_0", "W")  # DDPM-style NIN shortcut
        if w is not None:
            put("NIN_0.W", w)
            put("NIN_0.b", g("NIN_0", "b"))
    elif kind == "combine":
        put("Conv_0.weight", _ti_conv(g("Conv_0", "Conv_0", "kernel")))
        put("Conv_0.bias", g("Conv_0", "Conv_0", "bias"))
    elif kind == "firconv":
        put("Conv2d_0.weight", _ti_conv(g("Conv2d_0", "weight")))
        put("Conv2d_0.bias", g("Conv2d_0", "bias"))
    elif kind == "updown":
        put("Conv_0.weight", _ti_conv(g("Conv_0", "Conv_0", "kernel")))
        put("Conv_0.bias", g("Conv_0", "Conv_0", "bias"))
    else:
        raise ValueError(f"unknown kind {kind}")


def export_ncsnpp_state_dict(params: Dict[str, Any], **config
                             ) -> Dict[str, np.ndarray]:
    """Inverse of `convert_ncsnpp_state_dict`: our Flax params tree -> a torch
    NCSN++(-v2/-48k) backbone state_dict (keys ``all_modules.{i}.*`` +
    ``output_layer.*``), loadable with ``module.load_state_dict(strict=True)``
    in the reference (ncsnpp.py:107-253 registration order).

    Key ordering matters beyond naming: ``torch_ema`` associates
    ``shadow_params`` with parameters positionally, so the dict is built in
    the reference's module-registration order (verified against the real
    torch modules in tests/test_export.py).

    NOTE: pass ``image_size`` equal to the frequency count the model was
    trained with (n_fft//2 + 1) — attention placement in our models follows
    the runtime feature height, and the reference layout only matches when
    image_size equals it (`export_lightning_checkpoint` derives this
    automatically).
    """
    reader = _TreeReader(params)
    sd: Dict[str, np.ndarray] = {}
    # output_layer FIRST: the reference registers it before all_modules
    # (ncsnpp.py:105 vs 253, same in _v2/_48k), and dict order here must match
    # torch's state_dict/named_parameters order for EMA shadow alignment.
    sd["output_layer.weight"] = _ti_conv(reader.get(("output_layer", "kernel")))
    sd["output_layer.bias"] = reader.get(("output_layer", "bias"))
    for idx, name, kind in ncsnpp_module_walk(**config):
        _collect_kind(f"all_modules.{idx}", name, kind, reader, sd)
    missed = reader.unconsumed()
    if missed:
        raise ValueError(
            f"unexported param leaves: {missed[:10]} (+{max(0, len(missed)-10)} more)")
    return sd


def export_dcunet_state_dict(params: Dict[str, Any],
                             batch_stats: Optional[Dict[str, Any]] = None,
                             dcunet_architecture: str = "DilDCUNet-v2",
                             dcunet_time_embedding: str = "gfp",
                             dcunet_temb_layers_global: int = 2,
                             **config) -> Dict[str, np.ndarray]:
    """Inverse of `convert_dcunet_state_dict`: (params, batch_stats) trees ->
    torch DCUNet state_dict (incl. BatchNorm running stats and the
    ``num_batches_tracked`` counters torch's strict load expects)."""
    from .models.dcunet import DCUNET_ARCHITECTURES

    reader = _TreeReader(params)
    stats_reader = _TreeReader(batch_stats or {})
    sd: Dict[str, np.ndarray] = {}

    if dcunet_time_embedding != "none":
        name = "embed_gfp" if dcunet_time_embedding == "gfp" else "embed_ds"
        w = reader.get((name, "W"))
        if w is not None:
            sd["embed.0.W"] = w
        for i in range(dcunet_temb_layers_global):
            tidx = 1 + 2 * i
            for part in ("re", "im"):
                sd[f"embed.{tidx}.{part}.weight"] = _ti_linear(
                    reader.get((f"embed_global{i}", part, "kernel")))
                sd[f"embed.{tidx}.{part}.bias"] = reader.get(
                    (f"embed_global{i}", part, "bias"))

    def export_complex_conv(tprefix, mypath, transposed=False):
        tf = _ti_convT if transposed else _ti_conv
        for part in ("re", "im"):
            if transposed:
                k = reader.get(mypath + (f"{part}_kernel",))
                b = reader.get(mypath + (f"{part}_bias",))
            else:
                k = reader.get(mypath + (part, "kernel"))
                b = reader.get(mypath + (part, "bias"))
            sd[f"{tprefix}.{part}_module.weight"] = tf(k)
            if b is not None:
                sd[f"{tprefix}.{part}_module.bias"] = b

    def export_norm(tprefix, mypath):
        if reader.get(mypath + ("re", "scale")) is not None:
            for part in ("re", "im"):
                sd[f"{tprefix}.{part}_module.weight"] = reader.get(
                    mypath + (part, "scale"))
                sd[f"{tprefix}.{part}_module.bias"] = reader.get(
                    mypath + (part, "bias"))
                sd[f"{tprefix}.{part}_module.running_mean"] = stats_reader.get(
                    mypath + (part, "mean"))
                sd[f"{tprefix}.{part}_module.running_var"] = stats_reader.get(
                    mypath + (part, "var"))
                sd[f"{tprefix}.{part}_module.num_batches_tracked"] = np.asarray(
                    0, np.int64)
        else:  # CbN
            for p in ("Wrr", "Wri", "Wii", "Br", "Bi"):
                sd[f"{tprefix}.{p}"] = reader.get(mypath + (p,))

    def export_embed_layer(tprefix, mypath, temb_layers):
        for i in range(max(0, temb_layers - 1)):
            tidx = 2 * i
            for part in ("re", "im"):
                sd[f"{tprefix}.{tidx}.{part}.weight"] = _ti_linear(
                    reader.get(mypath + (f"lin{i}", part, "kernel")))
                sd[f"{tprefix}.{tidx}.{part}.bias"] = reader.get(
                    mypath + (f"lin{i}", part, "bias"))
        fidx = 2 * max(0, temb_layers - 1)
        for part in ("re", "im"):
            sd[f"{tprefix}.{fidx}.dense.{part}.weight"] = _ti_linear(
                reader.get(mypath + ("feature_dense", part, "kernel")))
            sd[f"{tprefix}.{fidx}.dense.{part}.bias"] = reader.get(
                mypath + ("feature_dense", part, "bias"))

    conf_encoders, conf_decoders = DCUNET_ARCHITECTURES[dcunet_architecture]
    n_enc = len(conf_encoders)
    n_dec = len(conf_decoders) - 1
    temb_local = config.get("dcunet_temb_layers_local", 1)

    for i in range(n_enc):
        export_complex_conv(f"encoders.{i}.conv", (f"encoder{i}", "conv"))
        export_norm(f"encoders.{i}.norm", (f"encoder{i}", "norm"))
        if dcunet_time_embedding != "none":
            export_embed_layer(f"encoders.{i}.embed_layer",
                               (f"encoder{i}", "embed_layer"), temb_local)
    for i in range(n_dec):
        export_complex_conv(f"decoders.{i}.deconv", (f"decoder{i}", "deconv"),
                            transposed=True)
        export_norm(f"decoders.{i}.norm", (f"decoder{i}", "norm"))
        if dcunet_time_embedding != "none":
            export_embed_layer(f"decoders.{i}.embed_layer",
                               (f"decoder{i}", "embed_layer"), temb_local)
    export_complex_conv("output_layer", ("output_layer",), transposed=True)

    missed = reader.unconsumed() + stats_reader.unconsumed()
    if missed:
        raise ValueError(
            f"unexported param leaves: {missed[:10]} (+{max(0, len(missed)-10)} more)")
    return sd


def export_lightning_checkpoint(ckpt_path: str, out_path: str) -> Dict[str, Any]:
    """Export one of this framework's Orbax checkpoints as a reference-style
    Lightning ``.ckpt`` (torch pickle), so a model TRAINED ON TPU can be loaded
    back into the sp-uhh/sgmse ecosystem (``ScoreModel.load_from_checkpoint``,
    reference enhancement.py:34). Inverse of `convert_lightning_checkpoint`.

    Produces: ``state_dict`` with ``dnn.``-prefixed backbone tensors,
    ``hyper_parameters`` (our embedded config — key names mirror the reference
    argparse flags), ``global_step``/``epoch``, and the ``'ema'`` entry in
    ``torch_ema`` format with ``shadow_params`` positionally aligned with the
    trainable-parameter registration order (reference model.py:100-109).
    Returns the checkpoint dict that was written.
    """
    import torch

    from .checkpoint import load_checkpoint

    state, config = load_checkpoint(ckpt_path)
    backbone = config.get("backbone", "ncsnpp")

    # Attention placement: the reference CONSTRUCTS attention from image_size-
    # derived resolutions (ncsnpp.py:84,178) but CONSUMES it at runtime H
    # (ncsnpp.py:308) — the two only agree when image_size == num_freqs, and
    # any other combination desynchronizes its m_idx module walk. Our model is
    # runtime-H-driven, so the faithful reference description of a trained
    # model is image_size = the DSP's frequency count; export the walk AND the
    # hyperparameters with that value so the .ckpt reconstructs correctly.
    num_freqs = int(config.get("n_fft", 510)) // 2 + 1
    config = dict(config, image_size=num_freqs)

    def to_torch_sd(params, batch_stats=None):
        if backbone == "dcunet":
            sd = export_dcunet_state_dict(params, batch_stats, **config)
        else:
            sd = export_ncsnpp_state_dict(params, **config)
        return {f"dnn.{k}": v for k, v in sd.items()}

    batch_stats = (state.get("model_state") or {}).get("batch_stats")
    sd = to_torch_sd(state["params"], batch_stats)

    ema_entry = None
    ema_params = state.get("ema_params")
    if ema_params is not None:
        ema_sd = to_torch_sd(ema_params, batch_stats)
        trainable = [k for k in sd
                     if not k.endswith(("running_mean", "running_var",
                                        "num_batches_tracked"))
                     and not _is_fourier_w(k)]
        ema_entry = {
            "decay": float(config.get("ema_decay", 0.999)),
            "num_updates": int(np.asarray(state.get(
                "num_updates", state.get("step", 0)))),
            "shadow_params": [torch.from_numpy(np.ascontiguousarray(ema_sd[k]))
                              for k in trainable],
            "collected_params": None,
        }

    step = int(np.asarray(state.get("step", 0)))
    ckpt = {
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "hyper_parameters": dict(config),
        "global_step": step,
        "epoch": 0,
        "pytorch_lightning_version": "2.0.0",
    }
    if ema_entry is not None:
        ckpt["ema"] = ema_entry
    torch.save(ckpt, out_path)
    return ckpt


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
    """CLI: python -m sgmse_tpu.convert <in> <out>

    Two-way converter, direction auto-detected from the input path:
      - <in> is a torch Lightning ``.ckpt`` FILE  -> import: writes an Orbax
        checkpoint directory loadable with checkpoint.load_score_model
        (EMA weights included).
      - <in> is one of our Orbax checkpoint DIRECTORIES -> export: writes a
        reference-style Lightning ``.ckpt`` so TPU-trained models can be used
        with sp-uhh/sgmse (``ScoreModel.load_from_checkpoint``).
    """
    import argparse
    import os as _os

    parser = argparse.ArgumentParser(
        description="Two-way sp-uhh/sgmse Lightning .ckpt <-> Orbax checkpoint "
                    "converter (direction auto-detected: .ckpt file in = import "
                    "to Orbax dir; checkpoint dir in = export to .ckpt).")
    parser.add_argument("input", help="Lightning .ckpt file OR Orbax ckpt dir")
    parser.add_argument("out", help="Output Orbax dir OR output .ckpt path")
    args = parser.parse_args()
    if _os.path.isdir(args.input):
        export_lightning_checkpoint(args.input, args.out)
        print(f"Exported {args.input} -> {args.out} (Lightning .ckpt)")
    else:
        model, _ = convert_lightning_checkpoint(args.input, out_path=args.out)
        print(f"Converted {args.input} -> {args.out} "
              f"(backbone={model.backbone}, sde={model.sde_name})")


if __name__ == "__main__":
    _main()
