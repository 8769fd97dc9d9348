"""Precomputed per-node visual feature bank: real scenes on the
device-resident scan paths.

The on-device scan paths (trainers/scan_eval.py, device_dagger) render
observations with the procedural GridWorld raycaster — real MP3D scenes
cannot be rasterized on a TPU. But the policy never consumes pixels when
frozen-encoder features are available: the visual encoders honor
``rgb_features``/``depth_features`` observation keys
(models/encoders/visual_wrappers.py:59,114), the same precompute contract
the reference uses for RxR BERT features (reference
habitat_extensions/sensors.py:186-196) and for cached
``rgb_features``/``depth_features`` (reference
vlnce_baselines/models/encoders/resnet_encoders.py:92-95).

So: precompute encoder features at every (nav-graph node, heading bin) of a
scene — offline, with any renderer, including real habitat_sim when assets
are present (scripts/generate_feature_bank.py) — and the closed-loop scan
replaces per-step raycasts with one bank lookup per step:

    nearest node  = argmin over node distances      (one-hot contraction)
    heading bin   = round(heading / bin)            (one-hot contraction)
    features      = einsum('bm,bh,bmhf->bf', onehot_node, onehot_bin, bank)

All three stages are MXU-shaped matmuls (the TPU lookup rule,
PERFORMANCE.md: dense table lookups as one-hot contractions, never scalar
gathers).

Bank schema (one ``{scene_id}.npz`` per scene):
    node_pos        [M, 2]  f32   world (x, z) per node
    num_headings    scalar  int   H heading bins, bin k = k * 2pi/H
    rgb_features    [M, H, F_rgb]   f16 (flattened encoder features)
    depth_features  [M, H, F_depth] f16
    rgb_shape / depth_shape         unflattened feature shapes
"""

from __future__ import annotations

import os
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlnce_tpu.utils.logging import logger


class FeatureBankBatch(NamedTuple):
    """Per-episode bank arrays stacked on a leading batch axis (node axes
    padded to the largest M in the batch; padding nodes sit at +1e9 so the
    nearest-node argmin never selects them)."""

    node_pos: jnp.ndarray  # [B, M, 2] f32
    rgb: jnp.ndarray  # [B, M, H, F_rgb] f16
    depth: jnp.ndarray  # [B, M, H, F_depth] f16
    rgb_shape: Tuple[int, ...]
    depth_shape: Tuple[int, ...]

    @property
    def num_headings(self) -> int:
        return int(self.rgb.shape[2])


def save_scene_bank(
    path: str,
    node_pos: np.ndarray,
    rgb_features: np.ndarray,
    depth_features: np.ndarray,
    rgb_shape: Tuple[int, ...],
    depth_shape: Tuple[int, ...],
) -> None:
    M, H = rgb_features.shape[:2]
    np.savez_compressed(
        path,
        node_pos=node_pos.astype(np.float32),
        num_headings=np.int32(H),
        rgb_features=rgb_features.astype(np.float16).reshape(M, H, -1),
        depth_features=depth_features.astype(np.float16).reshape(M, H, -1),
        rgb_shape=np.asarray(rgb_shape, np.int32),
        depth_shape=np.asarray(depth_shape, np.int32),
    )


def load_bank_shapes(bank_dir: str, episode) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Feature shapes recorded in an episode's scene bank, WITHOUT loading
    (or device_put-ing) the feature arrays — npz members materialize on
    access, so reading only the two shape records costs nothing. Used by
    scan_eval's shape probe: uploading a full [M, H, F] bank just to read
    two tuples would double-buffer the first scene in HBM."""
    sid = _scene_key(episode.scene_id)
    path = os.path.join(bank_dir, f"{sid}.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"feature bank for scene {sid!r} not found at {path}; "
            f"generate it with scripts/generate_feature_bank.py"
        )
    with np.load(path) as z:
        return (
            tuple(int(x) for x in z["rgb_shape"]),
            tuple(int(x) for x in z["depth_shape"]),
        )


def load_bank_batch(bank_dir: str, episodes: List, m_quantum: int = 64) -> FeatureBankBatch:
    """Load the per-scene banks for a batch of episodes and stack them
    (one device_put for the whole batch). The node axis M is padded up to a
    multiple of m_quantum so that chunks over scenes with different node
    counts land in the same compiled-shape bucket — per-chunk exact-M
    padding retraced the eval segment for every distinct M (~13s per
    retrace on a remote-attached chip, PERFORMANCE.md)."""
    cache: Dict[str, dict] = {}
    loaded = []
    for ep in episodes:
        sid = _scene_key(ep.scene_id)
        if sid not in cache:
            path = os.path.join(bank_dir, f"{sid}.npz")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"feature bank for scene {sid!r} not found at {path}; "
                    f"generate it with scripts/generate_feature_bank.py"
                )
            with np.load(path) as z:
                cache[sid] = {k: z[k] for k in z.files}
        loaded.append(cache[sid])

    H = int(loaded[0]["num_headings"])
    rgb_shape = tuple(int(x) for x in loaded[0]["rgb_shape"])
    depth_shape = tuple(int(x) for x in loaded[0]["depth_shape"])
    for z in loaded:
        if int(z["num_headings"]) != H:
            raise ValueError("feature banks disagree on num_headings")

    M = max(z["node_pos"].shape[0] for z in loaded)
    if m_quantum > 1:
        M = -(-M // m_quantum) * m_quantum
    B = len(loaded)
    node_pos = np.full((B, M, 2), 1e9, np.float32)
    rgb = np.zeros((B, M, H, loaded[0]["rgb_features"].shape[-1]), np.float16)
    depth = np.zeros((B, M, H, loaded[0]["depth_features"].shape[-1]), np.float16)
    for b, z in enumerate(loaded):
        m = z["node_pos"].shape[0]
        node_pos[b, :m] = z["node_pos"]
        rgb[b, :m] = z["rgb_features"]
        depth[b, :m] = z["depth_features"]
    node_pos_d, rgb_d, depth_d = jax.device_put((node_pos, rgb, depth))
    logger.info(
        f"feature bank batch: {B} episodes, M<={M} nodes x {H} headings, "
        f"{(rgb.nbytes + depth.nbytes) / 2**20:.1f} MiB resident"
    )
    return FeatureBankBatch(node_pos_d, rgb_d, depth_d, rgb_shape, depth_shape)


def _scene_key(scene_id: str) -> str:
    base = os.path.basename(str(scene_id))
    return os.path.splitext(base)[0]


def lookup_features(
    bank: FeatureBankBatch,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    max_dist: float = 0.0,
    return_distance: bool = False,
):
    """Features at the nearest (node, heading-bin) for each env — jit-safe,
    all contractions.

    pos [B, 3] world position; heading [B] radians (counter-clockwise, the
    device-sim convention). Returns {"rgb_features": [B, *rgb_shape],
    "depth_features": [B, *depth_shape]} in f32.

    `max_dist` > 0 guards against silently serving a far node's visuals
    (lattice spacing s puts true poses up to s/sqrt(2) from a node; anything
    beyond the configured radius means the pose left the bank's coverage):
    such lookups return ZERO features — the same "no signal" the padded
    batch slots carry — instead of the nearest node's wrong view. Set
    TPU.FEATURE_BANK_MAX_DIST to enable on the scan paths. With
    `return_distance`, also returns the per-env nearest-node distance [B]
    for coverage diagnostics.
    """
    B, M, H = bank.rgb.shape[:3]
    xz = jnp.stack([pos[:, 0], pos[:, 2]], axis=-1)  # [B, 2]
    d2 = jnp.sum((bank.node_pos - xz[:, None, :]) ** 2, axis=-1)  # [B, M]
    d2min = jnp.min(d2, axis=-1)  # [B]
    node_oh = jax.nn.one_hot(jnp.argmin(d2, axis=-1), M, dtype=jnp.float32)

    bin_w = 2.0 * jnp.pi / H
    idx = jnp.mod(jnp.round(heading / bin_w).astype(jnp.int32), H)
    head_oh = jax.nn.one_hot(idx, H, dtype=jnp.float32)

    def contract(table):
        f = jnp.einsum(
            "bm,bh,bmhf->bf", node_oh, head_oh, table.astype(jnp.float32)
        )
        return f

    rgb = contract(bank.rgb)
    depth = contract(bank.depth)
    if max_dist and max_dist > 0.0:
        covered = (d2min <= float(max_dist) ** 2).astype(jnp.float32)[:, None]
        rgb = rgb * covered
        depth = depth * covered
    obs = {
        "rgb_features": rgb.reshape((B,) + bank.rgb_shape),
        "depth_features": depth.reshape((B,) + bank.depth_shape),
    }
    if return_distance:
        return obs, jnp.sqrt(d2min)
    return obs


def check_bank_coverage(
    bank_dir: str, episodes: List, max_dist: float
) -> None:
    """Loud load-time guard: every episode's START position must be within
    `max_dist` of a bank node — catches missing-node exports and
    wrong-scene banks before a silent zero-feature rollout. (In-scan
    coverage loss falls back to zero features, see lookup_features.)"""
    if not max_dist or max_dist <= 0.0:
        return
    worst = (None, 0.0)
    for ep in episodes:
        sid = _scene_key(ep.scene_id)
        path = os.path.join(bank_dir, f"{sid}.npz")
        with np.load(path) as z:
            nodes = z["node_pos"]
        p = np.asarray(ep.start_position, np.float64)
        d = float(np.min(np.hypot(nodes[:, 0] - p[0], nodes[:, 1] - p[-1])))
        if d > worst[1]:
            worst = (ep.episode_id, d)
    if worst[1] > max_dist:
        raise ValueError(
            f"feature bank does not cover episode {worst[0]}: start is "
            f"{worst[1]:.2f} m from the nearest bank node "
            f"(TPU.FEATURE_BANK_MAX_DIST={max_dist}); regenerate the bank "
            f"with denser nodes or raise the radius"
        )


def encode_poses(
    policy, transforms, specs, scene_batch, pos: np.ndarray,
    heading: np.ndarray, instr_shape: Tuple[int, ...] = (8,),
    instr_uuid: str = "instruction",
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, ...], Tuple[int, ...]]:
    """Render a batch of poses with the device sim and run the policy's
    frozen encoders — the bank generator's inner step for synthetic scenes
    (a habitat-backed generator renders with sim.get_observations_at and
    feeds the same encoder path). Returns (rgb [N, F], depth [N, F],
    rgb_shape, depth_shape)."""
    from vlnce_tpu.envs.device_sim import progress_batch, render_batch
    from vlnce_tpu.ops.obs_transforms import apply_obs_transforms_batch

    n = pos.shape[0]
    pos_d, heading_d = jax.device_put((pos.astype(np.float32), heading.astype(np.float32)))
    obs = render_batch(scene_batch, pos_d, heading_d, specs)
    obs["progress"] = progress_batch(scene_batch, pos_d)
    obs[instr_uuid] = jnp.zeros((n,) + tuple(instr_shape), jnp.int32)
    batch = apply_obs_transforms_batch(obs, transforms)
    _, _, feats = policy.act_with_features(
        batch,
        policy.initial_rnn_states(n),
        jnp.zeros((n, 1), jnp.int32),
        jnp.ones((n, 1), jnp.float32),
        deterministic=True,
    )
    rgb = np.asarray(feats["rgb_features"], np.float32)
    depth = np.asarray(feats["depth_features"], np.float32)
    return (
        rgb.reshape(n, -1), depth.reshape(n, -1),
        tuple(rgb.shape[1:]), tuple(depth.shape[1:]),
    )


def encode_scene_bank(
    policy, transforms, specs, scene, nodes: np.ndarray,
    headings: np.ndarray, chunk: int = 256,
    instr_shape: Tuple[int, ...] = (8,), instr_uuid: str = "instruction",
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, ...], Tuple[int, ...]]:
    """Encode every (node, heading) pose of ONE scene in fixed-size padded
    chunks -> (rgb [M, H, F_rgb], depth [M, H, F_depth], rgb_shape,
    depth_shape).

    The chunking matters for compile behavior, not just memory: a ragged
    final chunk compiles a fresh render+encode program per distinct
    remainder (one per scene/spacing on CPU test meshes, a multi-minute
    recompile per scene on a remote-attached chip). Padding the last chunk
    to `chunk` poses keeps the whole bank generation — and repeat runs over
    different scenes — on ONE compiled shape; the padded rows are sliced
    off before returning. Shared by scripts/generate_feature_bank.py and
    the bank fidelity tests.
    """
    from vlnce_tpu.envs.device_sim import SceneBatch

    M, H = nodes.shape[0], len(headings)
    total = M * H
    # every (node, heading) pose, node-major (reshape to [M, H, F] below)
    pos = np.zeros((total, 3), np.float32)
    pos[:, 0] = np.repeat(nodes[:, 0], H)
    pos[:, 2] = np.repeat(nodes[:, 1], H)
    head = np.tile(np.asarray(headings, np.float32), M)

    scenes = jax.device_put(SceneBatch(
        occupancy=np.broadcast_to(scene.occupancy, (chunk,) + scene.occupancy.shape),
        wall_colors=np.broadcast_to(scene.wall_colors, (chunk,) + scene.wall_colors.shape),
        floor_color=np.broadcast_to(scene.floor_color, (chunk, 3)),
        ceil_color=np.broadcast_to(scene.ceil_color, (chunk, 3)),
        goal_field=np.ones((chunk,) + scene.occupancy.shape, np.float32),
        d0=np.ones((chunk,), np.float32),
        origin_xz=np.broadcast_to(np.asarray(scene.origin, np.float32), (chunk, 2)),
    ))
    rgb_rows, depth_rows = [], []
    rgb_shape = depth_shape = None
    for lo in range(0, total, chunk):
        hi = min(lo + chunk, total)
        n = hi - lo
        p, h = pos[lo:hi], head[lo:hi]
        if n < chunk:
            p = np.concatenate([p, np.repeat(p[-1:], chunk - n, axis=0)])
            h = np.concatenate([h, np.repeat(h[-1:], chunk - n, axis=0)])
        rgb, depth, rgb_shape, depth_shape = encode_poses(
            policy, transforms, specs, scenes, p, h,
            instr_shape=instr_shape, instr_uuid=instr_uuid,
        )
        rgb_rows.append(rgb[:n])
        depth_rows.append(depth[:n])
    return (
        np.concatenate(rgb_rows).reshape(M, H, -1),
        np.concatenate(depth_rows).reshape(M, H, -1),
        rgb_shape, depth_shape,
    )
