"""Weight-conversion fidelity tests (SURVEY.md §7 hard part 2).

Torch fixture modules are built inline with reference-style submodule names;
converted flax outputs must match torch outputs to ~1e-4.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from vlnce_tpu.models.convert import (
    convert_gn_resnet_encoder,
    convert_policy_state_dict,
    convert_tv_resnet,
    _to_mutable,
)
from vlnce_tpu.models.encoders.resnet import GNResNetEncoder, TVResNet


def torch_tv_resnet18():
    """resnet18 trunk with torchvision submodule names (conv1, bn1,
    layer{i}.{b}.conv{j}/bn{j}/downsample)."""

    class BasicBlock(nn.Module):
        def __init__(self, cin, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = None
            if stride != 1 or cin != planes:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, planes, 1, stride, bias=False), nn.BatchNorm2d(planes)
                )
            self.relu = nn.ReLU()

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idt)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = nn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
            self.layer3 = nn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))
            self.layer4 = nn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
            return x

    return Net()


def _randomize_bn_stats(module):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_(1.0, 0.2)
            m.bias.data.normal_(0, 0.2)


def test_tv_resnet18_numerics():
    torch.manual_seed(0)
    net = torch_tv_resnet18().eval()
    _randomize_bn_stats(net)
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    flax_net = TVResNet(version="resnet18")
    variables = flax_net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _to_mutable(jax.tree_util.tree_map(np.asarray, dict(variables["params"])))
    sd = {k: v for k, v in net.state_dict().items()}
    convert_tv_resnet(sd, params, "", "", indexed=False)
    out = flax_net.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def torch_gn_encoder():
    """habitat-ddppo-style encoder with reference key names
    (backbone.conv1.{0,1}, backbone.layer{i}.{b}.convs.{idx},
    .downsample.{0,1}, compression.{0,1}); resnet18-shaped basic blocks at
    baseplanes 32."""

    def gn(c):
        return nn.GroupNorm(16, c)

    class Block(nn.Module):
        def __init__(self, cin, planes, stride=1):
            super().__init__()
            self.convs = nn.Sequential(
                nn.Conv2d(cin, planes, 3, stride, 1, bias=False), gn(planes), nn.ReLU(True),
                nn.Conv2d(planes, planes, 3, 1, 1, bias=False), gn(planes),
            )
            self.downsample = None
            if stride != 1 or cin != planes:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, planes, 1, stride, bias=False), gn(planes)
                )
            self.relu = nn.ReLU()

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            return self.relu(self.convs(x) + idt)

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Sequential(nn.Conv2d(1, 32, 7, 2, 3, bias=False), gn(32), nn.ReLU(True))
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(Block(32, 32), Block(32, 32))
            self.layer2 = nn.Sequential(Block(32, 64, 2), Block(64, 64))
            self.layer3 = nn.Sequential(Block(64, 128, 2), Block(128, 128))
            self.layer4 = nn.Sequential(Block(128, 256, 2), Block(256, 256))

        def forward(self, x):
            x = self.maxpool(self.conv1(x))
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
            return x

    class Encoder(nn.Module):
        def __init__(self, num_c):
            super().__init__()
            self.backbone = Backbone()
            self.compression = nn.Sequential(
                nn.Conv2d(256, num_c, 3, padding=1, bias=False), nn.GroupNorm(1, num_c), nn.ReLU(True)
            )

        def forward(self, x):
            x = torch.nn.functional.avg_pool2d(x, 2)
            return self.compression(self.backbone(x))

    return Encoder


def test_gn_resnet_encoder_numerics():
    torch.manual_seed(1)
    enc = GNResNetEncoder(input_hw=(128, 128), backbone="resnet18")
    num_c, h, w = enc.output_shape_chw()
    tnet = torch_gn_encoder()(num_c).eval()
    x = np.random.RandomState(1).rand(2, 128, 128, 1).astype(np.float32)

    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _to_mutable(jax.tree_util.tree_map(np.asarray, dict(variables["params"])))
    sd = {k: v for k, v in tnet.state_dict().items()}
    convert_gn_resnet_encoder(sd, params, "", "")
    out = enc.apply({"params": params}, jnp.asarray(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_full_cma_state_dict_conversion_shapes():
    """A synthetic reference-named state_dict with correct shapes must load
    into the CMA param tree with every mapped leaf replaced."""
    from gymnasium import spaces

    from vlnce_tpu.config import get_config
    from vlnce_tpu.models.cma_policy import CMAPolicy

    cfg = get_config(opts=[
        "MODEL.DEPTH_ENCODER.backbone", "resnet18",
        "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
        "MODEL.INSTRUCTION_ENCODER.bidirectional", True,
    ])
    space = spaces.Dict({
        "rgb": spaces.Box(0, 255, (32, 32, 3), np.uint8),
        "depth": spaces.Box(0, 1, (32, 32, 1), np.float32),
        "instruction": spaces.Box(0, 10000, (16,), np.int32),
        "progress": spaces.Box(0, 1, (1,), np.float32),
    })
    pol = CMAPolicy.from_config(cfg, space, spaces.Discrete(4))
    pol.init_params(jax.random.PRNGKey(0))

    # build a torch-named state_dict by inverting the converter's layout rules
    sd = build_reference_cma_state_dict(pol.params)
    new_params = convert_policy_state_dict(sd, pol.params, "CMAPolicy")
    # spot-check: a converted linear got transposed correctly
    w = np.asarray(sd["net.state_q.weight"])
    np.testing.assert_allclose(np.asarray(new_params["net"]["state_q"]["kernel"]), w.T)
    k = np.asarray(sd["net.rgb_kv.weight"])
    np.testing.assert_allclose(np.asarray(new_params["net"]["rgb_kv"]["kernel"]), k[:, :, 0].T)


def build_reference_cma_state_dict(params):
    """Create a torch-style state_dict with the reference's key names, shaped
    to match `params` (used to validate the mapping end to end)."""
    rng = np.random.RandomState(0)
    sd = {}

    def t(shape):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32))

    p = params

    def shape(path):
        node = p
        for part in path.split("/"):
            node = node[part]
        return tuple(node.shape)

    # instruction encoder (biLSTM)
    for sfx, name in (("", "rnn_fwd"), ("_reverse", "rnn_bwd")):
        for pn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            sd[f"net.instruction_encoder.encoder_rnn.{pn}_l0{sfx}"] = t(shape(f"net/instruction_encoder/{name}/cell/{pn}"))
    sd["net.instruction_encoder.embedding_layer.weight"] = t(shape("net/instruction_encoder/embedding"))

    # depth encoder (GN resnet18 encoder + spatial embeddings)
    dep_enc = p["net"]["depth_encoder"]["visual_encoder"]
    dep = dep_enc["backbone"]
    sd["net.depth_encoder.visual_encoder.backbone.conv1.0.weight"] = t(_inv_conv(dep["stem_conv"]["kernel"].shape))
    sd["net.depth_encoder.visual_encoder.backbone.conv1.1.weight"] = t(dep["stem_gn"]["scale"].shape)
    sd["net.depth_encoder.visual_encoder.backbone.conv1.1.bias"] = t(dep["stem_gn"]["bias"].shape)
    for lname, block in sorted(dep.items()):
        if not lname.startswith("layer"):
            continue
        li, bi = lname[5:].split("_")
        src = f"net.depth_encoder.visual_encoder.backbone.layer{li}.{bi}"
        conv_ids, gn_ids = (0, 3), (1, 4)
        for j, (cid, gid) in enumerate(zip(conv_ids, gn_ids), start=1):
            sd[f"{src}.convs.{cid}.weight"] = t(_inv_conv(block[f"conv{j}"]["kernel"].shape))
            sd[f"{src}.convs.{gid}.weight"] = t(block[f"gn{j}"]["scale"].shape)
            sd[f"{src}.convs.{gid}.bias"] = t(block[f"gn{j}"]["bias"].shape)
        if "ds_conv" in block:
            sd[f"{src}.downsample.0.weight"] = t(_inv_conv(block["ds_conv"]["kernel"].shape))
            sd[f"{src}.downsample.1.weight"] = t(block["ds_gn"]["scale"].shape)
            sd[f"{src}.downsample.1.bias"] = t(block["ds_gn"]["bias"].shape)
    sd["net.depth_encoder.visual_encoder.compression.0.weight"] = t(_inv_conv(dep_enc["compression_conv"]["kernel"].shape))
    sd["net.depth_encoder.visual_encoder.compression.1.weight"] = t(dep_enc["compression_gn"]["scale"].shape)
    sd["net.depth_encoder.visual_encoder.compression.1.bias"] = t(dep_enc["compression_gn"]["bias"].shape)
    sd["net.depth_encoder.spatial_embeddings.weight"] = t(p["net"]["depth_encoder"]["spatial_embeddings"].shape)

    # rgb encoder (torchvision resnet18, indexed Sequential names)
    rgb = p["net"]["rgb_encoder"]["cnn"]
    sd["net.rgb_encoder.cnn.0.weight"] = t(_inv_conv(rgb["conv1"]["kernel"].shape))
    for pn in ("weight", "bias", "running_mean", "running_var"):
        sd[f"net.rgb_encoder.cnn.1.{pn}"] = t(rgb["bn1"]["weight"].shape)
    idx_map = {"layer1": 4, "layer2": 5, "layer3": 6, "layer4": 7}
    for lname, block in sorted(rgb.items()):
        if not lname.startswith("layer"):
            continue
        li, bi = lname.split("_")
        src = f"net.rgb_encoder.cnn.{idx_map[li]}.{bi}"
        conv = 1
        while f"conv{conv}" in block:
            sd[f"{src}.conv{conv}.weight"] = t(_inv_conv(block[f"conv{conv}"]["kernel"].shape))
            for pn in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{src}.bn{conv}.{pn}"] = t(block[f"bn{conv}"]["weight"].shape)
            conv += 1
        if "ds_conv" in block:
            sd[f"{src}.downsample.0.weight"] = t(_inv_conv(block["ds_conv"]["kernel"].shape))
            for pn in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{src}.downsample.1.{pn}"] = t(block["ds_bn"]["weight"].shape)
    sd["net.rgb_encoder.spatial_embeddings.weight"] = t(p["net"]["rgb_encoder"]["spatial_embeddings"].shape)

    # CMA heads
    def lin(src, dst):
        kin, kout = p_shape(p, dst)
        sd[f"{src}.weight"] = t((kout, kin))
        sd[f"{src}.bias"] = t((kout,))

    def p_shape(tree, path):
        node = tree
        for part in path.split("/"):
            node = node[part]
        return tuple(node["kernel"].shape)

    lin("action_distribution.linear", "action_distribution")
    for rnn_path, src in (("net/state_encoder", "net.state_encoder.rnn"), ("net/second_state_encoder", "net.second_state_encoder.rnn")):
        for pn in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            node = p
            for part in f"{rnn_path}/cell/{pn}".split("/"):
                node = node[part]
            sd[f"{src}.{pn}_l0"] = t(tuple(node.shape))
    sd["net.prev_action_embedding.weight"] = t(p["net"]["prev_action_embedding"].shape)
    lin("net.rgb_linear.2", "net/rgb_linear")
    lin("net.depth_linear.1", "net/depth_linear")
    for conv_src, conv_dst in (("net.rgb_kv", "net/rgb_kv"), ("net.depth_kv", "net/depth_kv"), ("net.text_k", "net/text_k")):
        kin, kout = p_shape(p, conv_dst)
        sd[f"{conv_src}.weight"] = t((kout, kin, 1))
        sd[f"{conv_src}.bias"] = t((kout,))
    lin("net.state_q", "net/state_q")
    lin("net.text_q", "net/text_q")
    lin("net.second_state_compress.0", "net/second_state_compress")
    return sd


def _inv_conv(flax_shape):
    kh, kw, cin, cout = flax_shape
    return (cout, cin, kh, kw)
