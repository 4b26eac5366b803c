"""torchvision state_dict -> Flax params conversion for pretrained encoders.

The reference downloads ImageNet-pretrained torchvision encoders at model
construction (src/unet_models.py:345-352, src/models.py:22-47). This
environment has no torchvision and no network egress, so pretrained weights
arrive, when they arrive, as a `.pth`/`.npz` file on disk; this module maps
its tensors onto our Flax parameter tree. Without a weights file models train
from random init (he-normal, the reference's fallback at
src/steps/pytorch/models.py:35-48).

Layout conversion: torch conv weights are (O, I, kH, kW) -> flax (kH, kW, I, O);
linear (O, I) -> (I, O); BN weight/bias/running_mean/running_var ->
scale/bias/mean/var (params vs batch_stats collections).
"""

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _deconv(w):
    """torch ConvTranspose2d weight (I, O, kH, kW) -> flax ConvTranspose
    kernel (kH, kW, I, O), spatially flipped.

    flax.linen.ConvTranspose (transpose_kernel=False) correlates a
    fractionally-strided input with the kernel as-is, whereas torch's
    ConvTranspose2d is the gradient of a forward conv — the two agree exactly
    when the spatial taps are mirrored (verified in tests/test_torch_parity.py;
    with torch's k=4/s=2/p=1 the padding equals flax "SAME", and k=3/s=2/p=1/
    output_padding=1 equals flax ((1,2),(1,2)))."""
    return np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1].copy()


def strip_module_prefix(state: Mapping[str, "np.ndarray"]) -> Dict[str, "np.ndarray"]:
    """Drop a leading 'module.' (nn.DataParallel wrapping — the reference
    trains with DataParallel, src/models.py:65) from every key."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state.items()
    }


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.pt state_dict or a .npz into {name: ndarray}.

    Accepts the file shapes real reference checkpoints come in
    (src/steps/pytorch/utils.py:67-75): a plain state_dict, a
    {'state_dict': ...} wrapper, and 'module.'-prefixed keys from
    nn.DataParallel-wrapped training (src/models.py:65).
    """
    if path.endswith(".npz"):
        with np.load(path) as f:
            return strip_module_prefix({k: f[k] for k in f.files})
    import torch  # CPU torch is available in this image

    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return strip_module_prefix(
        {k: v.detach().cpu().numpy() for k, v in state.items()})


def convert_resnet_encoder(
    state: Mapping[str, np.ndarray], depth: int
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision resnet{34,101,152} state_dict -> (params, batch_stats)
    subtrees for mapping_tpu.models.resnet.ResNetEncoder.

    Naming: torch `layerL.B.convI` -> flax `layerL_{B}/convI`;
    `layerL.B.downsample.{0,1}` -> `layerL_{B}/downsample_{conv,bn}`.
    """
    from mapping_tpu.models.resnet import _CONFIGS

    _, layers, _ = _CONFIGS[depth]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def bn(src_prefix, dst_path):
        put(params, dst_path + ("scale",), np.asarray(state[src_prefix + ".weight"]))
        put(params, dst_path + ("bias",), np.asarray(state[src_prefix + ".bias"]))
        put(stats, dst_path + ("mean",), np.asarray(state[src_prefix + ".running_mean"]))
        put(stats, dst_path + ("var",), np.asarray(state[src_prefix + ".running_var"]))

    put(params, ("conv1", "kernel"), _conv(state["conv1.weight"]))
    bn("bn1", ("bn1",))

    is_bottleneck = depth >= 50
    n_convs = 3 if is_bottleneck else 2
    for stage, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_{b}"
            for ci in range(1, n_convs + 1):
                put(params, (dst, f"conv{ci}", "kernel"),
                    _conv(state[f"{src}.conv{ci}.weight"]))
                bn(f"{src}.bn{ci}", (dst, f"bn{ci}"))
            if f"{src}.downsample.0.weight" in state:
                put(params, (dst, "downsample_conv", "kernel"),
                    _conv(state[f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", (dst, "downsample_bn"))
    return params, stats


def convert_vgg_features(
    state: Mapping[str, np.ndarray]
) -> Dict[str, Dict[str, np.ndarray]]:
    """torchvision vgg `features.N.{weight,bias}` -> {conv_N: {kernel, bias}}.

    Our VGG U-Nets name convs by their torchvision features index
    (models/vgg.py), so this is a rename + transpose.
    """
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for key, value in state.items():
        parts = key.split(".")
        if parts[0] == "features" and parts[-1] in ("weight", "bias"):
            idx = parts[1]
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            out.setdefault(f"conv_{idx}", {})[leaf] = (
                _conv(value) if leaf == "kernel" else np.asarray(value)
            )
    return out


def _conv_bias(state, prefix):
    return {"kernel": _conv(state[prefix + ".weight"]),
            "bias": np.asarray(state[prefix + ".bias"])}


def _convrelu(state, prefix):
    """Reference ConvRelu (src/unet_models.py:25-34) -> our ConvRelu scope."""
    return {"conv": _conv_bias(state, prefix + ".conv")}


def _decoder_block_v2(state, prefix, is_deconv):
    """Reference DecoderBlockV2 (src/unet_models.py:125-150) -> our
    DecoderBlockV2 scope (models/blocks.py). block.0 is ConvRelu (deconv
    mode) or Upsample (bilinear mode, no params)."""
    if is_deconv:
        return {
            "conv1": _convrelu(state, prefix + ".block.0"),
            "deconv": {"kernel": _deconv(state[prefix + ".block.1.weight"]),
                       "bias": np.asarray(state[prefix + ".block.1.bias"])},
        }
    return {
        "conv1": _convrelu(state, prefix + ".block.1"),
        "conv2": _convrelu(state, prefix + ".block.2"),
    }


def _decoder_block_v1(state, prefix):
    """Reference DecoderBlock (src/unet_models.py:42-53) -> our DecoderBlock."""
    return {
        "conv1": _convrelu(state, prefix + ".block.0"),
        "deconv": {"kernel": _deconv(state[prefix + ".block.1.weight"]),
                   "bias": np.asarray(state[prefix + ".block.1.bias"])},
    }


def _sub(state, prefix):
    n = len(prefix)
    return {k[n:]: v for k, v in state.items() if k.startswith(prefix)}


def convert_unet_resnet(
    state: Mapping[str, np.ndarray], depth: int, is_deconv: bool = True
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Full reference UNetResNet state_dict (src/unet_models.py:315-403) ->
    (params, batch_stats) for mapping_tpu.models.unet_resnet.UNetResNet."""
    state = strip_module_prefix(state)
    enc_params, enc_stats = convert_resnet_encoder(_sub(state, "encoder."), depth)
    params: Dict[str, Any] = {"encoder": enc_params}
    for name in ("center", "dec5", "dec4", "dec3", "dec2", "dec1"):
        params[name] = _decoder_block_v2(state, name, is_deconv)
    params["dec0"] = _convrelu(state, "dec0")
    params["final"] = _conv_bias(state, "final")
    return params, {"encoder": enc_stats}


def convert_albunet(
    state: Mapping[str, np.ndarray], is_deconv: bool = True
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference AlbuNet (src/unet_models.py:153-221) — same wiring as
    UNetResNet(34); our AlbuNet nests it under scope 'unet'."""
    params, stats = convert_unet_resnet(state, 34, is_deconv)
    return {"unet": params}, {"unet": stats}


def convert_unet11(state: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Full reference UNet11 state_dict (src/unet_models.py:56-106) ->
    params for mapping_tpu.models.vgg.UNet11 (no batch stats: VGG has no BN)."""
    state = strip_module_prefix(state)
    params: Dict[str, Any] = {}
    for idx in (0, 3, 6, 8, 11, 13, 16, 18):
        params[f"conv_{idx}"] = _conv_bias(state, f"encoder.{idx}")
    for name in ("center", "dec5", "dec4", "dec3", "dec2"):
        params[name] = _decoder_block_v1(state, name)
    params["dec1"] = _convrelu(state, "dec1")
    params["final"] = _conv_bias(state, "final")
    return params


_VGG16_STAGES = {
    "stage1": (0, 2), "stage2": (5, 7), "stage3": (10, 12, 14),
    "stage4": (17, 19, 21), "stage5": (24, 26, 28),
}


def convert_unet_vgg16(
    state: Mapping[str, np.ndarray], is_deconv: bool = True
) -> Dict[str, Any]:
    """Full reference UNetVGG16 state_dict (src/unet_models.py:224-312) ->
    params for mapping_tpu.models.vgg.UNetVGG16."""
    state = strip_module_prefix(state)
    params: Dict[str, Any] = {}
    for stage, indices in _VGG16_STAGES.items():
        params[stage] = {f"conv_{i}": _conv_bias(state, f"encoder.{i}")
                         for i in indices}
    for name in ("center", "dec5", "dec4", "dec3", "dec2"):
        params[name] = _decoder_block_v2(state, name, is_deconv)
    params["dec1"] = _convrelu(state, "dec1")
    params["final"] = _conv_bias(state, "final")
    return params


def detect_is_deconv(state: Mapping[str, np.ndarray]) -> bool:
    """Reference DecoderBlockV2 layout detection (src/unet_models.py:125-150):
    deconv mode is [ConvRelu, ConvTranspose2d, ReLU] — its block.0 is a
    ConvRelu (key `center.block.0.conv.weight`); bilinear-upsample mode is
    [Upsample, ConvRelu, ConvRelu] whose block.0 has no parameters."""
    state = strip_module_prefix(state)
    return "center.block.0.conv.weight" in state


def convert_full_checkpoint(
    state: Mapping[str, np.ndarray], encoder: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """COMPLETE reference checkpoint (encoder + decoders + final head, the
    state_dict the reference's ModelCheckpoint/save_model persist —
    src/steps/pytorch/utils.py:67-75) -> (params, batch_stats) for the
    matching Flax architecture named by `encoder`. The decoder flavor
    (deconv vs bilinear) is auto-detected from the state_dict layout."""
    state = strip_module_prefix(state)
    is_deconv = detect_is_deconv(state)
    if encoder.startswith("ResNet"):
        return convert_unet_resnet(state, int(encoder[6:]), is_deconv)
    if encoder == "AlbuNet":
        return convert_albunet(state, is_deconv)
    if encoder == "VGG11":
        return convert_unet11(state), {}
    if encoder == "VGG16":
        return convert_unet_vgg16(state, is_deconv), {}
    raise ValueError(
        f"checkpoint import unsupported for encoder {encoder!r} (supported: "
        "ResNet34/ResNet101/ResNet152/AlbuNet/VGG11/VGG16)")


def graft_encoder_params(model_params, encoder_tree, path=("encoder",)):
    """Return model_params with the subtree at `path` replaced by
    `encoder_tree` (converted pretrained weights); shapes are validated."""
    import jax

    node = model_params
    for p in path[:-1]:
        node = node[p]
    old = node[path[-1]]

    def check(a, b):
        if np.shape(a) != np.shape(b):
            raise ValueError(f"shape mismatch grafting encoder: {np.shape(a)} vs {np.shape(b)}")
        return np.asarray(b, dtype=np.asarray(a).dtype)

    grafted = jax.tree_util.tree_map(check, old, encoder_tree)
    out = dict(model_params)
    cursor = out
    for p in path[:-1]:
        cursor[p] = dict(cursor[p])
        cursor = cursor[p]
    cursor[path[-1]] = grafted
    return out
