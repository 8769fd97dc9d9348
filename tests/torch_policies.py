"""Full-policy torch fixtures for end-to-end activation parity tests.

These are clean-room torch mirrors of the flax policies, built so their
state_dict uses the REFERENCE's key names (the exact layout
vlnce_tpu/models/convert.py consumes). test_policy_parity.py converts their
weights into the flax policies and compares the forward activations —
the strongest possible check that real reference checkpoints reproduce
logits/values after conversion.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------


def _gn(groups, c):
    return nn.GroupNorm(groups, c, eps=1e-5)


class _GNBasic(nn.Module):
    def __init__(self, cin, planes, groups, stride=1):
        super().__init__()
        self.convs = nn.Sequential(
            nn.Conv2d(cin, planes, 3, stride, 1, bias=False), _gn(groups, planes), nn.ReLU(True),
            nn.Conv2d(planes, planes, 3, 1, 1, bias=False), _gn(groups, planes),
        )
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False), _gn(groups, planes)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        return F.relu(self.convs(x) + idt)


class _GNBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, groups, stride=1):
        super().__init__()
        out_ch = planes * self.expansion
        self.convs = nn.Sequential(
            nn.Conv2d(cin, planes, 1, bias=False), _gn(groups, planes), nn.ReLU(True),
            nn.Conv2d(planes, planes, 3, stride, 1, bias=False), _gn(groups, planes), nn.ReLU(True),
            nn.Conv2d(planes, out_ch, 1, bias=False), _gn(groups, out_ch),
        )
        self.downsample = None
        if stride != 1 or cin != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, out_ch, 1, stride, bias=False), _gn(groups, out_ch)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        return F.relu(self.convs(x) + idt)


class TorchGNResNetEncoder(nn.Module):
    """habitat-ddppo ResNetEncoder layout: avg-pool-2 stem, GN backbone,
    3x3 compression; key names backbone.conv1.{0,1}, layer{i}.{b}.convs.*,
    compression.{0,1}."""

    def __init__(self, in_ch=1, backbone="resnet50", input_hw=(256, 256), base_planes=32):
        super().__init__()
        groups = base_planes // 2
        layers = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}[backbone]
        block = _GNBasic if backbone == "resnet18" else _GNBottleneck
        exp = 1 if backbone == "resnet18" else 4

        class Backbone(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Sequential(
                    nn.Conv2d(in_ch, base_planes, 7, 2, 3, bias=False),
                    _gn(groups, base_planes), nn.ReLU(True),
                )
                self.maxpool = nn.MaxPool2d(3, 2, 1)
                inplanes = base_planes
                for li, (n, stride) in enumerate(zip(layers, (1, 2, 2, 2))):
                    planes = base_planes * (2 ** li)
                    blocks = []
                    for b in range(n):
                        blocks.append(block(inplanes, planes, groups, stride if b == 0 else 1))
                        inplanes = planes * exp
                    setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
                self.out_ch = inplanes

            def forward(self, x):
                x = self.maxpool(self.conv1(x))
                for li in range(1, 5):
                    x = getattr(self, f"layer{li}")(x)
                return x

        self.backbone = Backbone()
        spatial = input_hw[0] // 2
        final_spatial = max(1, int(spatial * (1.0 / 32.0)))
        num_c = int(round(2048 / (final_spatial ** 2)))
        self.compression = nn.Sequential(
            nn.Conv2d(self.backbone.out_ch, num_c, 3, padding=1, bias=False),
            nn.GroupNorm(1, num_c, eps=1e-5), nn.ReLU(True),
        )

    def forward(self, x):
        x = F.avg_pool2d(x, 2)
        return self.compression(self.backbone(x))


class _TVBasic(nn.Module):
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

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class _TVBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        out_ch = planes * self.expansion
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or cin != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, out_ch, 1, stride, bias=False), nn.BatchNorm2d(out_ch)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


def torch_tv_trunk(version="resnet50"):
    """torchvision trunk as an indexed Sequential (the reference wraps
    children so keys are cnn.0=conv1, cnn.1=bn1, cnn.4..7=layers)."""
    layers = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}[version]
    block = _TVBasic if version == "resnet18" else _TVBottleneck
    exp = 1 if version == "resnet18" else 4
    mods = [
        nn.Conv2d(3, 64, 7, 2, 3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(True),
        nn.MaxPool2d(3, 2, 1),
    ]
    inplanes = 64
    for li, (n, stride) in enumerate(zip(layers, (1, 2, 2, 2))):
        planes = 64 * (2 ** li)
        blocks = []
        for b in range(n):
            blocks.append(block(inplanes, planes, stride if b == 0 else 1))
            inplanes = planes * exp
        mods.append(nn.Sequential(*blocks))
    return nn.Sequential(*mods), inplanes


class TorchTVEncoder(nn.Module):
    """TorchVisionResNet spatial encoder: trunk -> spatial pooling +
    spatial_embeddings (reference resnet_encoders.py:118-219)."""

    def __init__(self, version="resnet50", spatial_output=True, single_spatial_filter=True,
                 normalize=False):
        super().__init__()
        self.cnn, self.layer_size = torch_tv_trunk(version)
        self.spatial_output = spatial_output
        self.single_spatial_filter = single_spatial_filter
        self.normalize = normalize
        if spatial_output:
            self.spatial_embeddings = nn.Embedding(16, 64)

    def forward(self, rgb):
        """rgb: [B, 3, H, W] uint8-valued float."""
        x = rgb / 255.0
        if self.normalize:
            mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
            std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
            x = (x - mean) / std
        feats = self.cnn(x)
        if self.spatial_output:
            if self.single_spatial_filter:
                feats = F.adaptive_avg_pool2d(feats, (4, 4))
            else:
                pooled = feats.mean(dim=(2, 3), keepdim=True)
                feats = pooled.expand(-1, -1, 4, 4)
            b = feats.shape[0]
            emb = self.spatial_embeddings.weight.T.reshape(1, 64, 4, 4).expand(b, -1, -1, -1)
            return torch.cat([feats, emb], dim=1)  # [B, C+64, 4, 4]
        return feats.mean(dim=(2, 3), keepdim=True)


class TorchDepthEncoder(nn.Module):
    """VlnResnetDepthEncoder spatial mode: GN encoder + spatial embeddings."""

    def __init__(self, backbone="resnet50", input_hw=(256, 256)):
        super().__init__()
        self.visual_encoder = TorchGNResNetEncoder(1, backbone, input_hw)
        self.spatial_embeddings = nn.Embedding(16, 64)

    def forward(self, depth):
        x = self.visual_encoder(depth)  # [B, C, 4, 4]
        b, _, h, w = x.shape
        emb = self.spatial_embeddings.weight.T.reshape(1, 64, h, w).expand(b, -1, -1, -1)
        return torch.cat([x, emb], dim=1)


class TorchInstructionEncoder(nn.Module):
    """Token path: embedding + packed biLSTM; full outputs [B, 2H, T]."""

    def __init__(self, vocab, emb, hidden, bidirectional=True, final_state_only=False):
        super().__init__()
        self.embedding_layer = nn.Embedding(vocab, emb, padding_idx=0)
        self.encoder_rnn = nn.LSTM(emb, hidden, batch_first=True, bidirectional=bidirectional)
        self.final_state_only = final_state_only

    def forward(self, tokens):
        lengths = (tokens != 0).long().sum(dim=1)
        x = self.embedding_layer(tokens)
        packed = nn.utils.rnn.pack_padded_sequence(
            x, lengths.cpu(), batch_first=True, enforce_sorted=False
        )
        out, (h, _) = self.encoder_rnn(packed)
        if self.final_state_only:
            return h.permute(1, 0, 2).reshape(tokens.shape[0], -1)
        out, _ = nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=tokens.shape[1]
        )
        return out.permute(0, 2, 1)  # [B, 2H, T]


class TorchRNNEncoder(nn.Module):
    """Masked single-step recurrent encoder; .rnn gives torch key names."""

    def __init__(self, input_size, hidden, rnn_type="GRU"):
        super().__init__()
        self.rnn = (nn.GRU if rnn_type == "GRU" else nn.LSTM)(input_size, hidden)
        self.rnn_type = rnn_type

    def forward(self, x, states, masks):
        """x: [B, D]; states: [B, L, H]; masks: [B, 1]."""
        states = states * masks.unsqueeze(-1)
        if self.rnn_type == "GRU":
            out, h = self.rnn(x.unsqueeze(0), states[:, 0].unsqueeze(0).contiguous())
            return out.squeeze(0), h.permute(1, 0, 2)
        h0 = states[:, 0].unsqueeze(0).contiguous()
        c0 = states[:, 1].unsqueeze(0).contiguous()
        out, (h, c) = self.rnn(x.unsqueeze(0), (h0, c0))
        return out.squeeze(0), torch.cat([h, c], dim=0).permute(1, 0, 2)


def _attn(q, k, v, scale, mask=None, mask_mode="additive"):
    """q [B, D]; k [B, D, P]; v [B, Dv, P] (CMA/waypoint attention math)."""
    energy = torch.einsum("bd,bdp->bp", q, k)
    if mask is not None:
        if mask_mode == "additive":
            energy = energy - mask.float() * 1e8
        else:
            energy = energy * mask.float()
    attn = F.softmax(energy * scale, dim=-1)
    return torch.einsum("bp,bdp->bd", attn, v)


# ---------------------------------------------------------------------------
# CMA policy
# ---------------------------------------------------------------------------


class TorchCMANet(nn.Module):
    def __init__(self, H=512, rgb_out=256, depth_out=128, num_actions=4,
                 vocab=100, emb=50, instr_hidden=128,
                 rgb_version="resnet50", depth_backbone="resnet50",
                 depth_hw=(256, 256)):
        super().__init__()
        self.H = H
        self.instruction_encoder = TorchInstructionEncoder(vocab, emb, instr_hidden)
        self.depth_encoder = TorchDepthEncoder(depth_backbone, depth_hw)
        self.rgb_encoder = TorchTVEncoder(rgb_version, spatial_output=True)
        self.prev_action_embedding = nn.Embedding(num_actions + 1, 32)

        rgb_c = self.rgb_encoder.layer_size + 64
        depth_flat = (int(round(2048 / 16)) + 64) * 16
        self.rgb_linear = nn.Sequential(
            nn.AdaptiveAvgPool1d(1), nn.Flatten(), nn.Linear(rgb_c, rgb_out), nn.ReLU(True)
        )
        self.depth_linear = nn.Sequential(nn.Flatten(), nn.Linear(depth_flat, depth_out), nn.ReLU(True))

        self.state_encoder = TorchRNNEncoder(rgb_out + depth_out + 32, H, "GRU")
        self.second_state_encoder = TorchRNNEncoder(H, H, "GRU")

        dk = H // 2
        instr_out = 2 * instr_hidden
        self.state_q = nn.Linear(H, dk)
        self.text_k = nn.Conv1d(instr_out, dk, 1)
        self.text_q = nn.Linear(instr_out, dk)
        self.rgb_kv = nn.Conv1d(rgb_c, dk + rgb_out, 1)
        self.depth_kv = nn.Conv1d(int(round(2048 / 16)) + 64, dk + depth_out, 1)
        self.second_state_compress = nn.Sequential(
            nn.Linear(H + instr_out + rgb_out + depth_out + 32, H), nn.ReLU(True)
        )
        self.progress_monitor = nn.Linear(H, 1)

    def forward(self, obs, rnn_states, prev_actions, masks):
        H = self.H
        instr = self.instruction_encoder(obs["instruction"])  # [B, C_t, T]
        depth = self.depth_encoder(obs["depth"])  # [B, C_d, 4, 4]
        depth = depth.flatten(2)  # [B, C_d, 16]
        rgb = self.rgb_encoder(obs["rgb"]).flatten(2)  # [B, C_r, 16]

        idx = ((prev_actions.float().view(-1) + 1.0) * masks.view(-1)).long()
        prev_emb = self.prev_action_embedding(idx)

        rgb_in = self.rgb_linear(rgb)
        depth_in = self.depth_linear(depth)
        state_in = torch.cat([rgb_in, depth_in, prev_emb], dim=1)
        state, rnn1 = self.state_encoder(state_in, rnn_states[:, :1], masks)

        scale = 1.0 / math.sqrt(H // 2)
        q = self.state_q(state)
        k = self.text_k(instr)
        text_mask = (instr == 0.0).all(dim=1)
        text_emb = _attn(q, k, instr, scale, text_mask, "additive")

        rgb_kv = self.rgb_kv(rgb)
        rgb_k, rgb_v = rgb_kv[:, : H // 2], rgb_kv[:, H // 2:]
        depth_kv = self.depth_kv(depth)
        depth_k, depth_v = depth_kv[:, : H // 2], depth_kv[:, H // 2:]
        tq = self.text_q(text_emb)
        rgb_att = _attn(tq, rgb_k, rgb_v, scale)
        depth_att = _attn(tq, depth_k, depth_v, scale)

        x = torch.cat([state, text_emb, rgb_att, depth_att, prev_emb], dim=1)
        x = self.second_state_compress(x)
        x, rnn2 = self.second_state_encoder(x, rnn_states[:, 1:], masks)

        progress = torch.tanh(self.progress_monitor(x))
        return x, torch.cat([rnn1, rnn2], dim=1), progress


class TorchCMAPolicy(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        num_actions = kw.get("num_actions", 4)
        self.net = TorchCMANet(**kw)

        class Head(nn.Module):
            def __init__(self, H, n):
                super().__init__()
                self.linear = nn.Linear(H, n)

            def forward(self, x):
                return self.linear(x)

        self.action_distribution = Head(self.net.H, num_actions)

    def forward(self, obs, rnn_states, prev_actions, masks):
        feats, rnn_out, progress = self.net(obs, rnn_states, prev_actions, masks)
        return self.action_distribution(feats), rnn_out, progress


# ---------------------------------------------------------------------------
# Seq2Seq policy
# ---------------------------------------------------------------------------


class TorchSeq2SeqNet(nn.Module):
    def __init__(self, H=512, rgb_out=256, depth_out=128, num_actions=4,
                 vocab=100, emb=50, instr_hidden=128,
                 rgb_version="resnet50", depth_backbone="resnet50",
                 depth_hw=(256, 256), use_prev_action=True):
        super().__init__()
        self.instruction_encoder = TorchInstructionEncoder(
            vocab, emb, instr_hidden, bidirectional=False, final_state_only=True
        )
        # non-spatial encoders: trunk -> pool -> Linear -> ReLU
        self.depth_encoder = nn.Module()
        self.depth_encoder.visual_encoder = TorchGNResNetEncoder(1, depth_backbone, depth_hw)
        self.depth_encoder.visual_fc = nn.Sequential(
            nn.Flatten(), nn.Linear(2048, depth_out), nn.ReLU(True)
        )
        self.rgb_encoder = nn.Module()
        self.rgb_encoder.cnn, rgb_c = torch_tv_trunk(rgb_version)
        self.rgb_encoder.fc = nn.Sequential(
            nn.Flatten(), nn.Linear(rgb_c, rgb_out), nn.ReLU(True)
        )
        self.use_prev_action = use_prev_action
        in_size = instr_hidden + depth_out + rgb_out
        if use_prev_action:
            self.prev_action_embedding = nn.Embedding(num_actions + 1, 32)
            in_size += 32
        self.state_encoder = TorchRNNEncoder(in_size, H, "GRU")
        self.progress_monitor = nn.Linear(H, 1)

    def forward(self, obs, rnn_states, prev_actions, masks):
        instr = self.instruction_encoder(obs["instruction"])
        d = self.depth_encoder.visual_encoder(obs["depth"])
        d = self.depth_encoder.visual_fc(d)
        r = self.rgb_encoder.cnn(obs["rgb"] / 255.0).mean(dim=(2, 3), keepdim=True)
        r = self.rgb_encoder.fc(r)
        x = torch.cat([instr, d, r], dim=1)
        if self.use_prev_action:
            idx = ((prev_actions.float().view(-1) + 1.0) * masks.view(-1)).long()
            x = torch.cat([x, self.prev_action_embedding(idx)], dim=1)
        x, rnn_out = self.state_encoder(x, rnn_states, masks)
        progress = torch.tanh(self.progress_monitor(x))
        return x, rnn_out, progress


class TorchSeq2SeqPolicy(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        num_actions = kw.get("num_actions", 4)
        self.net = TorchSeq2SeqNet(**kw)

        class Head(nn.Module):
            def __init__(self, H, n):
                super().__init__()
                self.linear = nn.Linear(H, n)

            def forward(self, x):
                return self.linear(x)

        self.action_distribution = Head(512, num_actions)

    def forward(self, obs, rnn_states, prev_actions, masks):
        feats, rnn_out, progress = self.net(obs, rnn_states, prev_actions, masks)
        return self.action_distribution(feats), rnn_out, progress


# ---------------------------------------------------------------------------
# Waypoint policy
# ---------------------------------------------------------------------------


class TorchMHA(nn.Module):
    def __init__(self, d_q_in, d_k_in, d_v_in, d_qk, d_v, num_heads, d_out):
        super().__init__()
        self.q_linear = nn.Linear(d_q_in, d_qk * num_heads, bias=False)
        self.k_linear = nn.Linear(d_k_in, d_qk * num_heads, bias=False)
        self.v_linear = nn.Linear(d_v_in, d_v * num_heads, bias=False)
        self.final_linear = nn.Linear(d_v * num_heads, d_out, bias=False)
        self.layer_norm = nn.LayerNorm(d_out, eps=1e-6)
        self.h = num_heads
        self.d_qk = d_qk
        self.d_v = d_v

    def forward(self, q, k, v):
        """q [B, Dq]; k/v [B, D, P]."""
        B, _, P = k.shape
        qh = self.q_linear(q).view(B, self.h, self.d_qk)
        kh = self.k_linear(k.permute(0, 2, 1)).view(B, P, self.h, self.d_qk)
        vh = self.v_linear(v.permute(0, 2, 1)).view(B, P, self.h, self.d_v)
        energy = torch.einsum("bhd,bphd->bhp", qh, kh)
        attn = F.softmax(energy / math.sqrt(self.d_qk), dim=-1)
        out = torch.einsum("bhp,bphd->bhd", attn, vh).reshape(B, self.h * self.d_v)
        return self.layer_norm(self.final_linear(out))


class TorchWaypointNet(nn.Module):
    P = 12

    def __init__(self, H=256, rgb_out=256, depth_out=128, vocab=100, emb=50,
                 instr_hidden=128, rgb_version="resnet50", depth_backbone="resnet50",
                 depth_hw=(256, 256), continuous_distance=True, continuous_offset=True,
                 discrete_distances=6, discrete_offsets=7,
                 min_distance=0.25, max_distance=2.75,
                 min_distance_var=0.0625, max_distance_var=3.52,
                 min_offset_var=0.0110, max_offset_var=0.0685,
                 offset_temperature=1.0):
        super().__init__()
        self.H, self.cfg = H, dict(
            continuous_distance=continuous_distance, continuous_offset=continuous_offset,
            discrete_distances=discrete_distances, discrete_offsets=discrete_offsets,
            min_distance=min_distance, max_distance=max_distance,
            min_distance_var=min_distance_var, max_distance_var=max_distance_var,
            min_offset_var=min_offset_var, max_offset_var=max_offset_var,
            offset_temperature=offset_temperature,
        )
        self.instruction_encoder = TorchInstructionEncoder(vocab, emb, instr_hidden)
        self.rgb_encoder = TorchTVEncoder(rgb_version, spatial_output=True, single_spatial_filter=False)
        self.depth_encoder = TorchDepthEncoder(depth_backbone, depth_hw)

        rgb_c = self.rgb_encoder.layer_size + 64
        depth_c = int(round(2048 / 16)) + 64
        instr_out = 2 * instr_hidden
        dk = H // 2

        self.rgb_pool_linear = nn.Linear(self.rgb_encoder.layer_size, rgb_out)
        self.rgb_hist_linear = nn.Sequential(
            nn.AdaptiveAvgPool1d(1), nn.Flatten(), nn.Linear(rgb_c, rgb_out), nn.ReLU(True)
        )
        self.depth_hist_linear = nn.Sequential(
            nn.Flatten(), nn.Linear(depth_c * 16, depth_out), nn.ReLU(True)
        )
        self.visual_rnn = TorchRNNEncoder(rgb_out + 4 + rgb_out + depth_out, H, "GRU")
        self.inst_attn_q = nn.Sequential(nn.Linear(H, dk), nn.ReLU(True))
        self.inst_attn_k = nn.Conv1d(instr_out, dk, 1)
        self.text_q_linear = nn.Linear(instr_out, dk)
        self.rgb_kv_spatial = nn.Conv1d(rgb_c, dk + rgb_out, 1)
        self.depth_kv_spatial = nn.Conv1d(depth_c, dk + depth_out, 1)
        d_kv = rgb_out + depth_out + 4
        self.pano_attn = TorchMHA(instr_out, d_kv, d_kv, 128, 128, 1, d_kv)
        self.main_state_compress = nn.Sequential(
            nn.Linear(instr_out + d_kv + H + 4, H), nn.ReLU(True)
        )
        self.main_state_encoder = TorchRNNEncoder(H, H, "GRU")
        self.compress_x_linear = nn.Sequential(nn.Linear(H, d_kv), nn.ReLU(True))
        self.stop_linear = nn.Linear(H, 1)

        catted = d_kv + H
        if continuous_distance:
            self.distance_linear = nn.Sequential(nn.Linear(catted, 1), nn.Sigmoid())
            self.distance_var_linear = nn.Sequential(nn.Linear(catted, 1), nn.Sigmoid())
        else:
            self.distance_linear = nn.Linear(catted, discrete_distances)
        if continuous_offset:
            self.offset_linear = nn.Sequential(nn.Linear(catted, 1), nn.Tanh())
            self.offset_var_linear = nn.Sequential(nn.Linear(catted, 1), nn.Sigmoid())
        else:
            self.offset_linear = nn.Linear(catted, discrete_offsets)

    def _offset_to_continuous(self, offset):
        if self.cfg["continuous_offset"]:
            return offset
        rad_per_pano = 2 * math.pi / self.P
        rad_per = rad_per_pano / (self.cfg["discrete_offsets"] - 1)
        return (-rad_per_pano / 2) + offset * rad_per

    def _distance_to_continuous(self, d):
        if self.cfg["continuous_distance"]:
            return d
        rng = self.cfg["max_distance"] - self.cfg["min_distance"]
        return self.cfg["min_distance"] + d * (rng / (self.cfg["discrete_distances"] - 1))

    def forward(self, obs, rnn_states, prev_actions, masks):
        P, H, c = self.P, self.H, self.cfg
        B = obs["rgb"].shape[0]
        instr = self.instruction_encoder(obs["instruction"])  # [B, C_t, T]

        m = masks.view(B, 1, 1, 1)
        rgb_frames = torch.cat([obs["rgb"], (obs["rgb_history"] * m).unsqueeze(1)], dim=1)
        rgb_emb = self.rgb_encoder(rgb_frames.flatten(0, 1)).flatten(2)  # [(13B), C, 16]
        rgb_emb = rgb_emb.view(B, P + 1, rgb_emb.shape[1], -1)
        depth_frames = torch.cat([obs["depth"], (obs["depth_history"] * m).unsqueeze(1)], dim=1)
        depth_emb = self.depth_encoder(depth_frames.flatten(0, 1)).flatten(2)
        depth_emb = depth_emb.view(B, P + 1, depth_emb.shape[1], -1)

        rgb_hist, rgb_emb = rgb_emb[:, P], rgb_emb[:, :P]
        depth_hist, depth_emb = depth_emb[:, P], depth_emb[:, :P]

        pano_prev = prev_actions["pano"].view(B, 1).float()
        delta = 2 * math.pi / P
        prev_feats = torch.cat([
            torch.sin(pano_prev * delta), torch.cos(pano_prev * delta),
            self._offset_to_continuous(prev_actions["offset"].view(B, 1).float()),
            self._distance_to_continuous(prev_actions["distance"].view(B, 1).float()),
        ], dim=1) * masks.view(B, 1)

        pooled = self.rgb_pool_linear(rgb_emb[:, :, : self.rgb_encoder.layer_size].mean(dim=3))
        rgb_pooled = pooled.mean(dim=1)
        rgb_hist_in = self.rgb_hist_linear(rgb_hist)
        depth_hist_in = self.depth_hist_linear(depth_hist)

        rnn_in = torch.cat([rgb_pooled, prev_feats, rgb_hist_in, depth_hist_in], dim=1)
        vis_feats, rnn1 = self.visual_rnn(rnn_in, rnn_states[:, :1], masks)

        dk = H // 2
        scale = 1.0 / math.sqrt(dk)
        q = self.inst_attn_q(vis_feats)
        k = self.inst_attn_k(instr)
        text_mask = torch.logical_not((instr == 0.0).all(dim=1))
        text_emb = _attn(q, k, instr, scale, text_mask, "multiplicative")

        flat_rgb = rgb_emb.reshape(B * P, rgb_emb.shape[2], -1)
        flat_depth = depth_emb.reshape(B * P, depth_emb.shape[2], -1)
        tq = self.text_q_linear(text_emb).repeat_interleave(P, dim=0)
        rgb_kv = self.rgb_kv_spatial(flat_rgb)
        depth_kv = self.depth_kv_spatial(flat_depth)
        sp_rgb = _attn(tq, rgb_kv[:, :dk], rgb_kv[:, dk:], scale).view(B, P, -1)
        sp_depth = _attn(tq, depth_kv[:, :dk], depth_kv[:, dk:], scale).view(B, P, -1)

        shared = torch.cat([sp_rgb, sp_depth, obs["angle_features"]], dim=2)  # [B, 12, d]
        shared_cf = shared.permute(0, 2, 1)
        attended = self.pano_attn(text_emb, shared_cf, shared_cf)

        x = torch.cat([text_emb, attended, vis_feats, prev_feats], dim=1)
        x = self.main_state_compress(x)
        x, rnn2 = self.main_state_encoder(x, rnn_states[:, 1:], masks)

        x_small = self.compress_x_linear(x)
        dotted = (shared * x_small.unsqueeze(1)).sum(dim=2)
        pano_stop = torch.cat([dotted, self.stop_linear(x)], dim=1)

        catted = torch.cat([shared, x.unsqueeze(1).expand(B, P, x.shape[-1])], dim=2)
        if c["continuous_distance"]:
            d1 = (c["max_distance"] - c["min_distance"]) * self.distance_linear(catted).squeeze(2) + c["min_distance"]
            d2 = (c["max_distance_var"] - c["min_distance_var"]) * self.distance_var_linear(catted).squeeze(2) + c["min_distance_var"]
        else:
            d1, d2 = self.distance_linear(catted), None
        if c["continuous_offset"]:
            # tanh applied inside Sequential; temperature folded in manually
            lin = self.offset_linear[0](catted)
            o1 = (math.pi / P) * torch.tanh(lin / c["offset_temperature"]).squeeze(2)
            o2 = (c["max_offset_var"] - c["min_offset_var"]) * self.offset_var_linear(catted).squeeze(2) + c["min_offset_var"]
        else:
            o1, o2 = self.offset_linear(catted), None

        return {
            "pano_stop_logits": pano_stop, "distance_var1": d1, "distance_var2": d2,
            "offset_var1": o1, "offset_var2": o2, "features": x,
            "rnn_states": torch.cat([rnn1, rnn2], dim=1),
        }


class TorchWaypointPolicy(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.net = TorchWaypointNet(**kw)

        class Critic(nn.Module):
            def __init__(self, H):
                super().__init__()
                self.fc = nn.Linear(H, 1)

            def forward(self, x):
                return self.fc(x)

        self.critic = Critic(self.net.H)

    def forward(self, obs, rnn_states, prev_actions, masks):
        out = self.net(obs, rnn_states, prev_actions, masks)
        out["value"] = self.critic(out["features"])
        return out


def randomize_bn_stats(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5, generator=g)
            m.running_var.uniform_(0.5, 2.0, generator=g)
            m.weight.data.normal_(1.0, 0.2, generator=g)
            m.bias.data.normal_(0, 0.2, generator=g)
