"""Torch checkpoint -> flax parameter conversion.

Loads reference-format torch state_dicts (reference policies, the DDPPO
PointGoal depth ResNet at resnet_encoders.py:48-61, torchvision ImageNet
weights) into this framework's param trees. Layout transforms:

    Linear  W[out, in]          -> kernel[in, out] (transpose)
    Conv2d  W[out, in, kh, kw]  -> kernel[kh, kw, in, out] (HWIO)
    Conv1d  W[out, in, 1]       -> Dense kernel[in, out]
    GroupNorm weight/bias       -> scale/bias
    BatchNorm (+running stats)  -> FrozenBatchNorm weight/bias/mean/var
    GRU/LSTM weight_ih etc.     -> copied as-is (torch layout preserved)

Weight-conversion fidelity is SURVEY.md §7 hard part 2: eval parity with
published checkpoints is unreachable if any of these drift.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    try:
        import torch

        if isinstance(t, torch.Tensor):
            return t.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def linear_kernel(w) -> jnp.ndarray:
    return jnp.asarray(_np(w).T)


def conv2d_kernel(w) -> jnp.ndarray:
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def conv1d_to_dense_kernel(w) -> jnp.ndarray:
    return jnp.asarray(_np(w)[:, :, 0].T)


def _set(tree: Dict, path: str, value: jnp.ndarray) -> None:
    parts = [p for p in path.split("/") if p]
    node = tree
    for p in parts[:-1]:
        node = node[p]
    leaf = parts[-1]
    assert leaf in node, f"no param at {path}"
    expected = node[leaf].shape
    assert tuple(value.shape) == tuple(expected), f"shape mismatch at {path}: {value.shape} vs {expected}"
    node[leaf] = value.astype(node[leaf].dtype)


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


# ---------------------------------------------------------------------------
# sub-converters
# ---------------------------------------------------------------------------


def convert_gn_resnet_encoder(sd: Dict[str, Any], params: Dict, prefix: str, out_prefix: str) -> None:
    """habitat ddppo ResNetEncoder torch keys -> GNResNetEncoder params.

    torch: {prefix}backbone.conv1.0.weight (stem conv), conv1.1 (GN),
    layer{i}.{b}.convs.{0,3,6}(convs)/.{1,4,7}(GNs), .downsample.{0,1},
    {prefix}compression.0/.1.
    """
    def gn(src, dst):
        _set(params, f"{dst}/scale", jnp.asarray(_np(sd[f"{src}.weight"])))
        _set(params, f"{dst}/bias", jnp.asarray(_np(sd[f"{src}.bias"])))

    _set(params, f"{out_prefix}/backbone/stem_conv/kernel", conv2d_kernel(sd[f"{prefix}backbone.conv1.0.weight"]))
    gn(f"{prefix}backbone.conv1.1", f"{out_prefix}/backbone/stem_gn")

    layer_blocks = {}
    pat = re.compile(re.escape(prefix) + r"backbone\.layer(\d)\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            layer_blocks[(int(m.group(1)), int(m.group(2)))] = True

    for (layer, block) in sorted(layer_blocks):
        src = f"{prefix}backbone.layer{layer}.{block}"
        dst = f"{out_prefix}/backbone/layer{layer}_{block}"
        is_bottleneck = f"{src}.convs.6.weight" in sd
        conv_ids = (0, 3, 6) if is_bottleneck else (0, 3)
        gn_ids = (1, 4, 7) if is_bottleneck else (1, 4)
        for j, (cid, gid) in enumerate(zip(conv_ids, gn_ids), start=1):
            _set(params, f"{dst}/conv{j}/kernel", conv2d_kernel(sd[f"{src}.convs.{cid}.weight"]))
            gn(f"{src}.convs.{gid}", f"{dst}/gn{j}")
        if f"{src}.downsample.0.weight" in sd:
            _set(params, f"{dst}/ds_conv/kernel", conv2d_kernel(sd[f"{src}.downsample.0.weight"]))
            gn(f"{src}.downsample.1", f"{dst}/ds_gn")

    _set(params, f"{out_prefix}/compression_conv/kernel", conv2d_kernel(sd[f"{prefix}compression.0.weight"]))
    gn(f"{prefix}compression.1", f"{out_prefix}/compression_gn")


def convert_tv_resnet(sd: Dict[str, Any], params: Dict, prefix: str, out_prefix: str, indexed: bool = True) -> None:
    """torchvision resnet trunk -> TVResNet params.

    indexed=True: the reference wraps children in nn.Sequential so keys are
    numeric ({prefix}0.weight = conv1, 1.* = bn1, 4.b.* = layer1 blocks, ...).
    indexed=False: plain torchvision names (conv1.weight, layer1.0.conv1...).
    """
    def name(mod: str) -> str:
        if not indexed:
            return f"{prefix}{mod}"
        mapping = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5", "layer3": "6", "layer4": "7"}
        head, _, rest = mod.partition(".")
        return f"{prefix}{mapping[head]}" + (f".{rest}" if rest else "")

    def bn(src_mod, dst):
        _set(params, f"{dst}/weight", jnp.asarray(_np(sd[f"{name(src_mod)}.weight"])))
        _set(params, f"{dst}/bias", jnp.asarray(_np(sd[f"{name(src_mod)}.bias"])))
        _set(params, f"{dst}/running_mean", jnp.asarray(_np(sd[f"{name(src_mod)}.running_mean"])))
        _set(params, f"{dst}/running_var", jnp.asarray(_np(sd[f"{name(src_mod)}.running_var"])))

    _set(params, f"{out_prefix}/conv1/kernel", conv2d_kernel(sd[name("conv1") + ".weight"]))
    bn("bn1", f"{out_prefix}/bn1")

    for layer in (1, 2, 3, 4):
        block = 0
        while f"{name(f'layer{layer}.{block}.conv1')}.weight" in sd:
            src = f"layer{layer}.{block}"
            dst = f"{out_prefix}/layer{layer}_{block}"
            conv = 1
            while f"{name(f'{src}.conv{conv}')}.weight" in sd:
                _set(params, f"{dst}/conv{conv}/kernel", conv2d_kernel(sd[f"{name(f'{src}.conv{conv}')}.weight"]))
                bn(f"{src}.bn{conv}", f"{dst}/bn{conv}")
                conv += 1
            if f"{name(f'{src}.downsample.0')}.weight" in sd:
                _set(params, f"{dst}/ds_conv/kernel", conv2d_kernel(sd[f"{name(f'{src}.downsample.0')}.weight"]))
                bn(f"{src}.downsample.1", f"{dst}/ds_bn")
            block += 1


def convert_rnn(sd: Dict[str, Any], params: Dict, prefix: str, out_prefix: str, bidirectional: bool = False) -> None:
    """torch GRU/LSTM (possibly inside habitat's RNNStateEncoder as
    {prefix}.weight_ih_l0 ...) -> cell params."""
    def one(suffix: str, dst: str):
        for pn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            _set(params, f"{dst}/{pn}", jnp.asarray(_np(sd[f"{prefix}.{pn}_l0{suffix}"])))

    if bidirectional:
        one("", f"{out_prefix}/rnn_fwd/cell")
        one("_reverse", f"{out_prefix}/rnn_bwd/cell")
    else:
        target = f"{out_prefix}/cell" if f"{prefix}.weight_ih_l0" in sd else None
        one("", target)


def convert_instruction_encoder(sd: Dict[str, Any], params: Dict, prefix: str, out_prefix: str) -> None:
    bidir = f"{prefix}encoder_rnn.weight_ih_l0_reverse" in sd
    if bidir:
        convert_rnn(sd, params, f"{prefix}encoder_rnn", out_prefix, bidirectional=True)
    else:
        for pn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            _set(params, f"{out_prefix}/rnn_fwd/cell/{pn}", jnp.asarray(_np(sd[f"{prefix}encoder_rnn.{pn}_l0"])))
    if f"{prefix}embedding_layer.weight" in sd:
        _set(params, f"{out_prefix}/embedding", jnp.asarray(_np(sd[f"{prefix}embedding_layer.weight"])))


def convert_depth_encoder(sd: Dict[str, Any], params: Dict, prefix: str, out_prefix: str) -> None:
    convert_gn_resnet_encoder(sd, params, f"{prefix}visual_encoder.", f"{out_prefix}/visual_encoder")
    if f"{prefix}visual_fc.1.weight" in sd:
        _set(params, f"{out_prefix}/visual_fc/kernel", linear_kernel(sd[f"{prefix}visual_fc.1.weight"]))
        _set(params, f"{out_prefix}/visual_fc/bias", jnp.asarray(_np(sd[f"{prefix}visual_fc.1.bias"])))
    if f"{prefix}spatial_embeddings.weight" in sd:
        _set(params, f"{out_prefix}/spatial_embeddings", jnp.asarray(_np(sd[f"{prefix}spatial_embeddings.weight"])))


def convert_rgb_encoder(sd: Dict[str, Any], params: Dict, prefix: str, out_prefix: str) -> None:
    convert_tv_resnet(sd, params, f"{prefix}cnn.", f"{out_prefix}/cnn", indexed=True)
    if f"{prefix}fc.1.weight" in sd:
        _set(params, f"{out_prefix}/fc/kernel", linear_kernel(sd[f"{prefix}fc.1.weight"]))
        _set(params, f"{out_prefix}/fc/bias", jnp.asarray(_np(sd[f"{prefix}fc.1.bias"])))
    if f"{prefix}spatial_embeddings.weight" in sd:
        _set(params, f"{out_prefix}/spatial_embeddings", jnp.asarray(_np(sd[f"{prefix}spatial_embeddings.weight"])))


def _linear(sd, params, src: str, dst: str, bias: bool = True) -> None:
    _set(params, f"{dst}/kernel", linear_kernel(sd[f"{src}.weight"]))
    if bias and f"{src}.bias" in sd:
        _set(params, f"{dst}/bias", jnp.asarray(_np(sd[f"{src}.bias"])))


def _conv1d(sd, params, src: str, dst: str) -> None:
    _set(params, f"{dst}/kernel", conv1d_to_dense_kernel(sd[f"{src}.weight"]))
    if f"{src}.bias" in sd:
        _set(params, f"{dst}/bias", jnp.asarray(_np(sd[f"{src}.bias"])))


# ---------------------------------------------------------------------------
# full-policy converters
# ---------------------------------------------------------------------------


def convert_policy_state_dict(sd: Dict[str, Any], params, policy_name: str):
    """Convert a reference policy state_dict into this framework's params."""
    params = _to_mutable(jax.tree_util.tree_map(np.asarray, dict(params)))
    sd = {k: v for k, v in sd.items()}

    if policy_name in ("Seq2SeqPolicy", "CMAPolicy"):
        # IL policies nest everything under `net`; the waypoint param tree is
        # rooted at the prediction net itself (see convert_waypoint_state_dict)
        convert_instruction_encoder(sd, params, "net.instruction_encoder.", "net/instruction_encoder")
        convert_depth_encoder(sd, params, "net.depth_encoder.", "net/depth_encoder")
        convert_rgb_encoder(sd, params, "net.rgb_encoder.", "net/rgb_encoder")

    if policy_name == "Seq2SeqPolicy":
        _linear(sd, params, "action_distribution.linear", "action_distribution")
        convert_rnn(sd, params, "net.state_encoder.rnn", "net/state_encoder")
        if "net.prev_action_embedding.weight" in sd:
            _set(params, "net/prev_action_embedding", jnp.asarray(_np(sd["net.prev_action_embedding.weight"])))
        if "net.progress_monitor.weight" in sd:
            _linear(sd, params, "net.progress_monitor", "net/progress_monitor")
    elif policy_name == "CMAPolicy":
        _linear(sd, params, "action_distribution.linear", "action_distribution")
        convert_rnn(sd, params, "net.state_encoder.rnn", "net/state_encoder")
        convert_rnn(sd, params, "net.second_state_encoder.rnn", "net/second_state_encoder")
        _set(params, "net/prev_action_embedding", jnp.asarray(_np(sd["net.prev_action_embedding.weight"])))
        _linear(sd, params, "net.rgb_linear.2", "net/rgb_linear")
        _linear(sd, params, "net.depth_linear.1", "net/depth_linear")
        _conv1d(sd, params, "net.rgb_kv", "net/rgb_kv")
        _conv1d(sd, params, "net.depth_kv", "net/depth_kv")
        _linear(sd, params, "net.state_q", "net/state_q")
        _conv1d(sd, params, "net.text_k", "net/text_k")
        _linear(sd, params, "net.text_q", "net/text_q")
        _linear(sd, params, "net.second_state_compress.0", "net/second_state_compress")
        if "net.progress_monitor.weight" in sd:
            _linear(sd, params, "net.progress_monitor", "net/progress_monitor")
    elif policy_name == "WaypointPolicy":
        convert_waypoint_state_dict(sd, params)
    else:
        raise ValueError(f"unknown policy {policy_name}")

    return jax.tree_util.tree_map(jnp.asarray, params)


def convert_waypoint_state_dict(sd: Dict[str, Any], params: Dict) -> None:
    convert_rnn(sd, params, "net.visual_rnn.rnn", "visual_rnn")
    convert_rnn(sd, params, "net.main_state_encoder.rnn", "main_state_encoder")
    _linear(sd, params, "net.rgb_pool_linear", "rgb_pool_linear")
    _linear(sd, params, "net.rgb_hist_linear.2", "rgb_hist_linear")
    _linear(sd, params, "net.depth_hist_linear.1", "depth_hist_linear")
    _linear(sd, params, "net.inst_attn_q.0", "inst_attn_q")
    _conv1d(sd, params, "net.inst_attn_k", "inst_attn_k")
    _linear(sd, params, "net.text_q_linear", "text_q_linear")
    _conv1d(sd, params, "net.rgb_kv_spatial", "rgb_kv_spatial")
    _conv1d(sd, params, "net.depth_kv_spatial", "depth_kv_spatial")
    for mha in ("q_linear", "k_linear", "v_linear", "final_linear"):
        _linear(sd, params, f"net.pano_attn.{mha}", f"pano_attn/{mha}", bias=False)
    if "net.pano_attn.layer_norm.weight" in sd:
        _set(params, "pano_attn/layer_norm/scale", jnp.asarray(_np(sd["net.pano_attn.layer_norm.weight"])))
        _set(params, "pano_attn/layer_norm/bias", jnp.asarray(_np(sd["net.pano_attn.layer_norm.bias"])))
    _linear(sd, params, "net.main_state_compress.0", "main_state_compress")
    _linear(sd, params, "net.stop_linear", "stop_linear")
    _linear(sd, params, "net.compress_x_linear.0", "compress_x_linear")
    for head, dst in (
        ("net.distance_linear.0", "distance_linear"),
        ("net.distance_linear", "distance_linear"),
        ("net.offset_linear.0", "offset_linear"),
        ("net.offset_linear", "offset_linear"),
        ("net.distance_var_linear.0", "distance_var_linear"),
        ("net.offset_var_linear.0", "offset_var_linear"),
    ):
        if f"{head}.weight" in sd:
            try:
                _linear(sd, params, head, dst)
            except AssertionError:
                pass
    _linear(sd, params, "critic.fc", "critic")
    convert_instruction_encoder(sd, params, "net.instruction_encoder.", "instruction_encoder")
    convert_depth_encoder(sd, params, "net.depth_encoder.", "depth_encoder")
    convert_rgb_encoder(sd, params, "net.rgb_encoder.", "rgb_encoder")


def load_pretrained_embeddings(embedding_file: str) -> Optional[np.ndarray]:
    """Load the GloVe-style instruction embedding table
    (embeddings.json.gz: JSON [vocab, dim] floats; PAD row 0 zeros, UNK row 1
    mean — reference instruction_encoder.py:51-61)."""
    import gzip
    import json
    import os

    if not os.path.exists(embedding_file):
        return None
    with gzip.open(embedding_file, "rt") as f:
        return np.asarray(json.load(f), dtype=np.float32)


def apply_pretrained_embeddings(params, embedding_file: str, path: str = "net/instruction_encoder/embedding"):
    """Overwrite the instruction embedding table if the file exists; returns
    (params, loaded: bool)."""
    table = load_pretrained_embeddings(embedding_file)
    if table is None:
        return params, False
    params = _to_mutable(jax.tree_util.tree_map(np.asarray, dict(params)))
    _set(params, path, jnp.asarray(table))
    return jax.tree_util.tree_map(jnp.asarray, params), True


def convert_ddppo_depth_checkpoint(ckpt: Dict[str, Any], params, out_prefix: str = "net/depth_encoder/visual_encoder"):
    """Load DDPPO PointGoal weights into the depth encoder: the reference
    remaps actor_critic.net.visual_encoder.* keys (resnet_encoders.py:48-61)."""
    params = _to_mutable(jax.tree_util.tree_map(np.asarray, dict(params)))
    weights = {}
    for k, v in ckpt["state_dict"].items():
        parts = k.split(".")[2:]
        if not parts or parts[0] != "visual_encoder":
            continue
        weights[".".join(parts[1:])] = v
    convert_gn_resnet_encoder(weights, params, "", out_prefix)
    return jax.tree_util.tree_map(jnp.asarray, params)
