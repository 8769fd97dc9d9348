"""Device-resident grid-world simulator (pure JAX, jit/scan-compatible).

The host-side GridWorldSim (vlnce_tpu/envs/gridworld.py) is the CPU stand-in
for Habitat-Sim. This module re-expresses the SAME world — identical
occupancy grids, raycast renderer, and collision-filtered dynamics — as pure
jnp functions with static shapes, so a full closed-loop rollout
(render -> policy act -> step) runs as ONE `lax.scan` on the TPU with zero
host round-trips per step. This is the capability the reference architecture
cannot express (Habitat-Sim is C++/OpenGL on the host; every policy step
crosses the process boundary, reference ddppo_waypoint_trainer.py:154-157's
pth/env split exists to measure that cost).

Parity contract (tested in tests/test_device_sim.py):
- dynamics (`step_discrete`) match GridWorldSim.step positions/headings;
- rendering (`render_camera`) matches GridWorldSim's raycast frames up to
  float32-vs-float64 rounding;
- scenes are built from the identical host `GridWorldScene` arrays.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlnce_tpu.envs.gridworld import _RES, get_scene

_WALL_HEIGHT = 2.0
_EYE = 1.0  # _EYE_HEIGHT_FRAC * _WALL_HEIGHT


class CameraSpec(NamedTuple):
    """Static per-camera render parameters (hashable: jit-safe)."""

    uuid: str
    height: int
    width: int
    hfov_deg: float
    orientation_y: float
    kind: str  # "rgb" | "depth"
    min_depth: float = 0.0
    max_depth: float = 10.0
    normalize_depth: bool = True


def camera_specs_from_config(sim_config) -> List[CameraSpec]:
    """Mirror of GridWorldSim.__init__'s camera parsing (gridworld.py:150-161)."""
    depth_cfg = getattr(sim_config, "DEPTH_SENSOR", None)
    min_d = float(depth_cfg.MIN_DEPTH) if depth_cfg else 0.0
    max_d = float(depth_cfg.MAX_DEPTH) if depth_cfg else 10.0
    norm_d = bool(depth_cfg.NORMALIZE_DEPTH) if depth_cfg else True
    specs = []
    for name in sim_config.AGENT_0.SENSORS:
        cam = getattr(sim_config, name, None)
        if cam is None:
            continue
        kind = "depth" if "DEPTH" in name else "rgb"
        orientation_y = float(cam.ORIENTATION[1]) if "ORIENTATION" in cam else 0.0
        specs.append(
            CameraSpec(
                cam.UUID, int(cam.HEIGHT), int(cam.WIDTH), float(cam.HFOV),
                orientation_y, kind, min_d, max_d, norm_d,
            )
        )
    return specs


class SceneBatch(NamedTuple):
    """Per-episode scene/goal arrays, stacked along a leading batch axis.

    `origin_xz` anchors each grid in WORLD coordinates (the x, z of cell
    [0, 0]'s corner): procedural GridWorld scenes sit at (0, 0); imported
    real-scene geometry (envs/scene_import.py) keeps its native MP3D frame,
    so episode start/goal positions flow through unshifted."""

    occupancy: jnp.ndarray  # [B, N, N] bool, True = blocked
    wall_colors: jnp.ndarray  # [B, N, N, 3] uint8
    floor_color: jnp.ndarray  # [B, 3] uint8
    ceil_color: jnp.ndarray  # [B, 3] uint8
    goal_field: jnp.ndarray  # [B, N, N] f32 geodesic meters to episode goal (inf = unreachable)
    d0: jnp.ndarray  # [B] f32 start geodesic distance (progress sensor denominator)
    origin_xz: jnp.ndarray  # [B, 2] f32 world (x, z) of cell [0, 0]'s corner


def _pad_grid(a: np.ndarray, n: int, fill) -> np.ndarray:
    """Pad a [N, N, ...] grid to [n, n, ...]; padding reads as `fill`
    (blocked occupancy / +inf field), so out-of-scene lookups behave like
    the boundary walls of a smaller grid."""
    if a.shape[0] == n:
        return a
    pad = [(0, n - a.shape[0]), (0, n - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
    return np.pad(a, pad, constant_values=fill)


def build_scene_batch(episodes) -> SceneBatch:
    """Stack host scene arrays for a batch of episodes.

    goal_field is the elementwise-min Dijkstra field over the episode's
    goals — the device analog of `min over goals` in
    GridWorldSim.geodesic_distance (gridworld.py:266-282). Scenes of
    different grid sizes (imported real scenes) pad to the batch max with
    blocked cells / +inf fields.
    """
    occ, colors, floor, ceil, fields, d0s, origins = [], [], [], [], [], [], []
    for ep in episodes:
        scene = get_scene(ep.scene_id)
        occ.append(scene.occupancy)
        colors.append(scene.wall_colors)
        floor.append(scene.floor_color)
        ceil.append(scene.ceil_color)
        origins.append(scene.origin)
        field = None
        for goal in ep.goals:
            g = np.asarray(goal.position, dtype=np.float64)
            cell = scene.world_to_cell(float(g[0]), float(g[-1]))
            f = scene.distance_field(cell)
            field = f if field is None else np.minimum(field, f)
        fields.append(field.astype(np.float32))
        s = np.asarray(ep.start_position, dtype=np.float64)
        si, sj = scene.world_to_cell(float(s[0]), float(s[-1]))
        # d0 for the progress sensor comes from the episode ANNOTATION, not
        # the sim geodesic — the host sensor reads
        # episode.info["geodesic_distance"] (tasks/sensors.py:127, reference
        # habitat_extensions/sensors.py:79-86); fall back to the field value
        # for episodes without the annotation
        info = getattr(ep, "info", None) or {}
        d0 = float(info.get("geodesic_distance") or 0.0)
        if d0 <= 0.0:
            d0 = max(float(field[si, sj]), 1e-6)
        d0s.append(d0)
    n = max(a.shape[0] for a in occ)
    occ = [_pad_grid(a, n, True) for a in occ]
    colors = [_pad_grid(a, n, 0) for a in colors]
    fields = [_pad_grid(a, n, np.inf) for a in fields]
    # ONE device_put for the whole batch: per-field jnp.asarray would pay a
    # full round trip each on remote-attached chips (PERFORMANCE.md rule:
    # host-visible work crosses the boundary once, batched)
    return jax.device_put(SceneBatch(
        occupancy=np.stack(occ),
        wall_colors=np.stack(colors),
        floor_color=np.stack(floor),
        ceil_color=np.stack(ceil),
        goal_field=np.stack(fields),
        d0=np.array(d0s, dtype=np.float32),
        origin_xz=np.array(origins, dtype=np.float32),
    ))


# ---------------------------------------------------------------------------
# navigation primitives (single env; callers vmap over the batch axis)
# ---------------------------------------------------------------------------


def _origin_xz(origin) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """origin: None (procedural scenes anchored at (0, 0) — subtracting the
    literal 0.0 is exact, so compiled math is unchanged) or a [2] world
    (x, z) of cell [0, 0]'s corner (imported scenes, SceneBatch.origin_xz)."""
    if origin is None:
        return jnp.float32(0.0), jnp.float32(0.0)
    return origin[0], origin[1]


def _cell_index(
    x: jnp.ndarray, z: jnp.ndarray, n: int, origin=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """world -> clipped cell indices; truncation matches numpy .astype(int32)
    on the non-negative in-world coordinates (gridworld.py:75-79,363-364)."""
    ox, oz = _origin_xz(origin)
    ci = jnp.clip(((x - ox) / _RES).astype(jnp.int32), 0, n - 1)
    cj = jnp.clip(((z - oz) / _RES).astype(jnp.int32), 0, n - 1)
    return ci, cj


def is_navigable(occupancy: jnp.ndarray, pos: jnp.ndarray, origin=None) -> jnp.ndarray:
    """occupancy [N,N]; pos [..., 3] -> bool [...] (gridworld.py:205-210)."""
    ci, cj = _cell_index(pos[..., 0], pos[..., 2], occupancy.shape[0], origin)
    return ~(_grid_lookup(occupancy, ci, cj) > 0.5)


def _advance(
    occupancy: jnp.ndarray, start: jnp.ndarray, delta: jnp.ndarray, ts: jnp.ndarray,
    origin=None,
):
    """Walk start -> start+delta at fractions ts, stopping before the first
    blocked sample. Returns (pos, fully_reached). Mirrors the forward walk in
    GridWorldSim.step_filter (gridworld.py:236-246): pos advances through
    consecutively navigable samples only."""
    cands = start[None, :] + delta[None, :] * ts[:, None]  # [K, 3]
    nav = is_navigable(occupancy, cands, origin)  # [K]
    k = jnp.sum(jnp.cumprod(nav.astype(jnp.int32)))  # leading-True count
    idx = jnp.maximum(k - 1, 0)
    pos = jnp.where(k > 0, cands[idx], start)
    return pos, k == ts.shape[0]


def step_filter(
    occupancy: jnp.ndarray,
    start: jnp.ndarray,
    end: jnp.ndarray,
    n_steps: int,
    allow_sliding: bool,
    origin=None,
) -> jnp.ndarray:
    """Collision-filtered move with optional axis sliding — the fixed-shape
    port of GridWorldSim.step_filter (gridworld.py:227-264). `n_steps` must
    equal the host's max(2, int(length / (0.25 * _RES))) for the fixed step
    length used, so sample fractions coincide exactly."""
    delta = end - start
    ts = jnp.linspace(0.0, 1.0, n_steps + 1)[1:]
    pos, reached = _advance(occupancy, start, delta, ts, origin)
    if not allow_sliding:
        return jnp.where(reached, end, pos)

    def slide(pos):
        remaining = end - pos
        for axis in (0, 2):
            shift = jnp.zeros(3).at[axis].set(remaining[axis])
            target_ok = is_navigable(occupancy, pos + shift, origin)
            slid, _ = _advance(occupancy, pos, shift, ts, origin)
            pos = jnp.where(target_ok, slid, pos)
        return pos

    # host semantics: sliding only runs when the walk was blocked; when the
    # walk fully reached `end`, the exact float target is returned
    return jnp.where(reached, end, slide(pos))


def step_discrete(
    occupancy: jnp.ndarray,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    action: jnp.ndarray,
    forward_step: float,
    turn_angle: float,
    allow_sliding: bool,
    origin=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One discrete sim step (STOP/FORWARD/LEFT/RIGHT), single env.

    Mirrors GridWorldSim.step (gridworld.py:176-194); LOOK_UP/DOWN (tilt) is
    not modeled — the R2R action space doesn't include it.
    """
    two_pi = 2.0 * math.pi
    fwd = jnp.stack([-jnp.sin(heading), jnp.zeros_like(heading), -jnp.cos(heading)])
    n_steps = max(2, int(forward_step / (0.25 * _RES)))
    moved = step_filter(occupancy, pos, pos + fwd * forward_step, n_steps, allow_sliding, origin)
    new_pos = jnp.where(action == 1, moved, pos)
    new_heading = jnp.where(
        action == 2,
        (heading + turn_angle) % two_pi,
        jnp.where(action == 3, (heading - turn_angle) % two_pi, heading),
    )
    return new_pos, new_heading


def step_tilt(tilt: jnp.ndarray, action: jnp.ndarray, tilt_angle: float) -> jnp.ndarray:
    """LOOK_UP/LOOK_DOWN camera pitch, clamped to ±60° — the RxR action
    space's extra axis (gridworld.py:189-192). Pose is unaffected."""
    third_pi = math.pi / 3
    return jnp.where(
        action == 4,
        jnp.minimum(tilt + tilt_angle, third_pi),
        jnp.where(action == 5, jnp.maximum(tilt - tilt_angle, -third_pi), tilt),
    )


def expert_action(
    occupancy: jnp.ndarray,
    field: jnp.ndarray,
    goal_xz: jnp.ndarray,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    goal_radius: float,
    turn_angle: float,
    max_descent: int = 8,
    origin=None,
) -> jnp.ndarray:
    """The oracle/expert action on device — ShortestPathFollower.
    get_next_action + the sensor's None->STOP mapping
    (tasks/shortest_path_follower.py:40-76, tasks/sensors.py:176-180).

    `field` is the distance field of THE FIRST goal (the sensor passes
    episode.goals[0].position), not the min-over-goals progress field.
    The polyline the host follower scans is a greedy descent over this field
    (gridworld.py:285-315); here the descent runs as a fixed-length scan
    that tracks the first cell center farther than 0.5 * 0.25 m from the
    agent, falling back to the goal position — the identical target
    selection. Assumes the agent is on a navigable cell (the dynamics
    guarantee it). Returns int32: 0 STOP, 1 FORWARD, 2 LEFT, 3 RIGHT.
    """
    _N = field.shape[0]
    ox, oz = _origin_xz(origin)
    ci, cj = _cell_index(pos[0], pos[2], _N, origin)
    d_goal = _grid_lookup(field, ci, cj)
    stop = (d_goal <= goal_radius) | ~jnp.isfinite(d_goal)

    # neighbor order matches the host's row-major (di, dj) sweep with its
    # first-strict-minimum tie-break (argmin is first-wins on ties)
    dis = jnp.asarray([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.int32)
    djs = jnp.asarray([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.int32)

    def body(carry, _):
        i, j, descending, found, tx, tz = carry
        fij = _grid_lookup(field, i, j)
        cont = descending & (fij > _RES)
        ni, nj = i + dis, j + djs
        inb = (ni >= 0) & (ni < _N) & (nj >= 0) & (nj < _N)
        nav = ~(_grid_lookup(occupancy, jnp.clip(ni, 0, _N - 1), jnp.clip(nj, 0, _N - 1)) > 0.5)
        vals = jnp.where(inb & nav, _grid_lookup(field, jnp.clip(ni, 0, _N - 1), jnp.clip(nj, 0, _N - 1)), jnp.inf)
        k = jnp.argmin(vals)
        improved = vals[k] < fij
        step_ok = cont & improved
        i2 = jnp.where(step_ok, ni[k], i)
        j2 = jnp.where(step_ok, nj[k], j)
        cx = ox + (i2.astype(jnp.float32) + 0.5) * _RES
        cz = oz + (j2.astype(jnp.float32) + 0.5) * _RES
        far = jnp.hypot(cx - pos[0], cz - pos[2]) > 0.5 * 0.25
        newly = step_ok & far & ~found
        tx2 = jnp.where(newly, cx, tx)
        tz2 = jnp.where(newly, cz, tz)
        found2 = found | newly
        return (i2, j2, step_ok & ~found2, found2, tx2, tz2), ()

    init = (ci, cj, ~stop, jnp.bool_(False), jnp.float32(0.0), jnp.float32(0.0))
    (_, _, _, found, tx, tz), _ = jax.lax.scan(body, init, None, length=max_descent)
    tx = jnp.where(found, tx, goal_xz[0])
    tz = jnp.where(found, tz, goal_xz[1])

    # steering (shortest_path_follower.py:60-72)
    two_pi = 2.0 * math.pi
    desired = jnp.arctan2(-(tx - pos[0]), -(tz - pos[2])) % two_pi
    delta = (desired - heading + math.pi) % two_pi - math.pi
    thr = turn_angle / 2.0 + 1e-6
    steer = jnp.where(
        jnp.abs(delta) <= thr, 1, jnp.where(delta > 0, 2, 3)
    ).astype(jnp.int32)
    return jnp.where(stop, 0, steer)


def geodesic_at(goal_field: jnp.ndarray, pos: jnp.ndarray, origin=None) -> jnp.ndarray:
    """goal_field [N,N]; pos [3] -> meters (snap handled at field build)."""
    ci, cj = _cell_index(pos[0], pos[2], goal_field.shape[0], origin)
    return _grid_lookup(goal_field, ci, cj)


_NEAREST_FREE_CACHE: Dict[str, np.ndarray] = {}


def nearest_free_cells(occ: np.ndarray) -> np.ndarray:
    """[N,N,2] int32: for every cell, the nearest navigable cell — the
    vectorized (and tie-break-identical: first minimum in the row-major free
    list) equivalent of GridWorldScene.nearest_navigable_cell
    (gridworld.py:117-121). Chunked over query cells so imported real
    scenes (N up to a few hundred -> tens of thousands of cells) stay at a
    bounded [chunk, F] distance matrix instead of [N^2, F]."""
    n = occ.shape[0]
    free = np.argwhere(~occ)  # row-major, matching the host argmin order
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    cells = np.stack([ii.ravel(), jj.ravel()], axis=1)  # [N*N, 2]
    out = np.empty((n * n, 2), np.int32)
    chunk = max(1, (1 << 22) // max(1, len(free)))  # ~32 MiB of int64 d2
    for lo in range(0, len(cells), chunk):
        c = cells[lo : lo + chunk]
        d2 = (
            (c[:, None, 0] - free[None, :, 0]) ** 2
            + (c[:, None, 1] - free[None, :, 1]) ** 2
        )
        out[lo : lo + chunk] = free[np.argmin(d2, axis=1)]
    return out.reshape(n, n, 2)


def nearest_free_cell_map(scene_id: str) -> np.ndarray:
    """Per-scene cached nearest_free_cells, precomputed once for the device
    snap_point."""
    if scene_id in _NEAREST_FREE_CACHE:
        return _NEAREST_FREE_CACHE[scene_id]
    nearest = nearest_free_cells(get_scene(scene_id).occupancy)
    _NEAREST_FREE_CACHE[scene_id] = nearest
    return nearest


def snap_point(
    occupancy: jnp.ndarray, nearest_map: jnp.ndarray, pos: jnp.ndarray, origin=None
) -> jnp.ndarray:
    """GridWorldSim.snap_point (gridworld.py:212-219): unchanged when
    navigable, else the nearest navigable cell center at y=0."""
    ox, oz = _origin_xz(origin)
    ci, cj = _cell_index(pos[0], pos[2], occupancy.shape[0], origin)
    ni = _grid_lookup(nearest_map[..., 0], ci, cj)
    nj = _grid_lookup(nearest_map[..., 1], ci, cj)
    snapped = jnp.stack([ox + (ni + 0.5) * _RES, jnp.zeros_like(ni), oz + (nj + 0.5) * _RES])
    return jnp.where(is_navigable(occupancy, pos, origin), pos, snapped)


def step_filter_dynamic(
    occupancy: jnp.ndarray,
    start: jnp.ndarray,
    end: jnp.ndarray,
    max_samples: int,
    allow_sliding: bool,
    origin=None,
) -> jnp.ndarray:
    """step_filter for a traced (data-dependent) move length.

    The host walks n = max(2, int(length / (0.25 * _RES))) samples at
    fractions i/n (gridworld.py:236-238). Here the sample COUNT is static
    (max_samples >= any possible n) but the FRACTIONS are the host's: ts_i =
    min(i/n, 1.0) — samples beyond n clamp to the endpoint, which leaves the
    leading-navigable-prefix semantics unchanged.
    """
    delta = end - start
    length = jnp.linalg.norm(delta[jnp.array([0, 2])])
    n = jnp.maximum(2, (length / (0.25 * _RES)).astype(jnp.int32))
    i = jnp.arange(1, max_samples + 1, dtype=jnp.float32)
    ts = jnp.minimum(i / n.astype(jnp.float32), 1.0)
    pos, reached = _advance(occupancy, start, delta, ts, origin)
    degenerate = length < 1e-9  # host returns `end` outright (gridworld.py:234)

    if allow_sliding:

        def slide(pos):
            remaining = end - pos
            for axis in (0, 2):
                shift = jnp.zeros(3).at[axis].set(remaining[axis])
                target_ok = is_navigable(occupancy, pos + shift, origin)
                slid, _ = _advance(occupancy, pos, shift, ts, origin)
                pos = jnp.where(target_ok, slid, pos)
            return pos

        pos = jnp.where(reached, end, slide(pos))
    else:
        pos = jnp.where(reached, end, pos)
    return jnp.where(degenerate, end, pos)


def waypoint_step(
    occupancy: jnp.ndarray,
    nearest_map: jnp.ndarray,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    r: jnp.ndarray,
    theta: jnp.ndarray,
    rotate_agent: bool,
    max_samples: int,
    allow_sliding: bool,
    origin=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GO_TOWARD_POINT on device, single env (tasks/actions.py:113-150 /
    reference habitat_extensions/actions.py:26-56): polar target ->
    collision-filtered straight-line move -> navigability check -> snap ->
    re-check; optionally rotate the agent toward the target."""
    ang = heading + theta
    target = pos + r * jnp.stack([-jnp.sin(ang), jnp.zeros_like(ang), -jnp.cos(ang)])
    moved = step_filter_dynamic(occupancy, pos, target, max_samples, allow_sliding, origin)
    nav = is_navigable(occupancy, moved, origin)
    snapped = snap_point(occupancy, nearest_map, moved, origin)
    snapped_ok = is_navigable(occupancy, snapped, origin)
    new_pos = jnp.where(nav & snapped_ok, snapped, pos)
    if rotate_agent:
        # compute_heading_to's (atan2(dx, dz) + pi) % 2pi convention
        # (tasks/geometry.py:122-133)
        two_pi = 2.0 * math.pi
        new_heading = (
            jnp.arctan2(target[0] - pos[0], target[2] - pos[2]) + math.pi
        ) % two_pi
        return new_pos, new_heading
    return new_pos, heading


def waypoint_reward(
    goal_field: jnp.ndarray,
    prev_distance: jnp.ndarray,
    prev_pos_xz: jnp.ndarray,
    pos_after: jnp.ndarray,
    r_pred: jnp.ndarray,
    stop: jnp.ndarray,
    *,
    slack_reward: float,
    use_distance_scaled_slack_reward: bool,
    scale_slack_on_prediction: bool,
    success_reward: float,
    distance_scalar: float,
    success_distance: float,
    origin=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """WaypointRewardMeasure on device, single env (tasks/measures.py:314-362
    / reference habitat_extensions/measures.py:153-233). Returns
    (reward, new_distance_to_goal, success)."""
    d = geodesic_at(goal_field, pos_after, origin)
    moved = jnp.linalg.norm(prev_pos_xz - pos_after[jnp.array([0, 2])])
    if use_distance_scaled_slack_reward:
        slack_distance = jnp.where(stop, moved, r_pred) if scale_slack_on_prediction else moved
        slack = jnp.minimum(slack_reward, slack_reward * slack_distance / 0.25)
    else:
        slack = jnp.asarray(slack_reward, jnp.float32)
    delta = prev_distance - d
    delta = jnp.where(jnp.isfinite(delta), delta, -1.0)
    success = (stop & (d < success_distance)).astype(jnp.float32)
    reward = slack + distance_scalar * delta + success_reward * success
    return reward, d, success


# ---------------------------------------------------------------------------
# rendering (single env, single camera; callers vmap over the batch axis)
# ---------------------------------------------------------------------------


def _grid_lookup(grid: jnp.ndarray, ci: jnp.ndarray, cj: jnp.ndarray) -> jnp.ndarray:
    """Dense point-lookup grid[ci, cj] expressed as two one-hot contractions.

    A dynamic gather of W*K points from the [N, N] grid lowers to the TPU
    scalar unit: 30.3 ms for the raycast's lookup batch (B=32, ~77k points
    each), measured on-chip. The identical lookup as one-hot matmuls rides
    the MXU at 0.14 ms — 216x. Exact: each one-hot row has a single 1, so
    every output is exactly one grid element (grid values up to 256 are
    representable in bf16; the occupancy/colour grids are 0/1 and 0-255).

    Integer/bool grids (values < 256, exact in bf16) take the matmul path;
    float grids take an exact masked-sum path (f32 one-hot multiply — a bf16
    matmul would round the grid values), which materializes [S, N] rows and
    so is meant for SMALL point counts (the geodesic-field and snap lookups).

    grid [N, M] (any numeric/bool dtype); ci/cj int32 of any common shape.
    Returns grid's values at (ci, cj) in float32, same shape as ci.
    """
    shape = ci.shape
    n, m = grid.shape
    s = ci.reshape(-1)
    t = cj.reshape(-1)
    if jnp.issubdtype(grid.dtype, jnp.floating):
        # where-select, not multiply: the geodesic field holds inf at
        # unreachable cells and inf * 0 would poison the sum with NaN
        sel_i = s[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
        sel_j = t[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
        rows = jnp.sum(jnp.where(sel_i[:, :, None], grid[None, :, :], 0), axis=1)
        vals = jnp.sum(jnp.where(sel_j, rows, 0), axis=1).astype(jnp.float32)
        return vals.reshape(shape)
    oh_i = (s[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    oh_j = (t[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    rows = oh_i @ grid.astype(jnp.bfloat16)  # [S, M]
    vals = jnp.sum(rows.astype(jnp.float32) * oh_j.astype(jnp.float32), axis=1)
    return vals.reshape(shape)


def _raycast(
    occupancy: jnp.ndarray, pos: jnp.ndarray, ray_angles: jnp.ndarray, max_t: float,
    origin=None,
):
    """Fixed-sample DDA over the occupancy grid. The host marches rays
    sequentially (gridworld.py:345-373); sampling every distance up front and
    taking the first blocked sample computes the identical hit (same 0.6*_RES
    step, same truncation/clipping) with no loop. The occupancy test and the
    first-hit selection are gather-free (see _grid_lookup)."""
    step = 0.6 * _RES
    K = int(max_t / step)
    dists = step * jnp.arange(1, K + 1, dtype=jnp.float32)  # [K]
    valid = dists < max_t
    dx = -jnp.sin(ray_angles)  # [W]
    dz = -jnp.cos(ray_angles)
    px = pos[0] + dx[:, None] * dists[None, :]  # [W, K]
    pz = pos[2] + dz[:, None] * dists[None, :]
    ci, cj = _cell_index(px, pz, occupancy.shape[0], origin)
    blocked = (_grid_lookup(occupancy, ci, cj) > 0.5) & valid[None, :]
    hit = jnp.any(blocked, axis=1)  # [W]
    first = jnp.argmax(blocked, axis=1)  # [W]
    # select-at-first via a one-hot mask over the sample axis (no gather);
    # sum-of-one-term is exact, so t == dists[first] bit-for-bit
    sel = jnp.arange(K, dtype=jnp.int32)[None, :] == first[:, None]  # [W, K]
    t = jnp.where(hit, jnp.sum(jnp.where(sel, dists[None, :], 0.0), axis=1), max_t)
    hit_ci = jnp.sum(jnp.where(sel, ci, 0), axis=1)
    hit_cj = jnp.sum(jnp.where(sel, cj, 0), axis=1)
    return t, hit, hit_ci, hit_cj


def render_camera_group(
    scene_occ: jnp.ndarray,
    wall_colors: jnp.ndarray,
    floor_color: jnp.ndarray,
    ceil_color: jnp.ndarray,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    orientations: Tuple[float, ...],
    spec: CameraSpec,
    tilt: jnp.ndarray | float = 0.0,
    origin=None,
) -> jnp.ndarray:
    """K same-spec cameras (e.g. a 12-pano rig) in ONE raycast; port of
    GridWorldSim._render_cameras/_shade (gridworld.py:375-428) in float32.
    Grouping matches the host's batched DDA and keeps the jitted graph small
    (one render program per camera kind, not per camera). Returns
    [K, H, W, C]."""
    h, w = spec.height, spec.width
    world_size = scene_occ.shape[0] * _RES  # square world spanned by the grid
    K = len(orientations)
    half_fov = math.radians(spec.hfov_deg) / 2.0
    xs = jnp.tan(jnp.linspace(-half_fov, half_fov, w))
    col_angles = -jnp.arctan(xs)
    headings = (heading + jnp.asarray(orientations)) % (2.0 * math.pi)  # [K]
    ray_angles = (headings[:, None] + col_angles[None, :]).reshape(-1)  # [K*W]

    max_t = float(spec.max_depth) if spec.kind == "depth" else 1.5 * world_size
    t, hit, hit_ci, hit_cj = _raycast(scene_occ, pos, ray_angles, max_t, origin)
    t = t.reshape(K, w)
    hit = hit.reshape(K, w)

    perp = t * jnp.cos(jnp.arctan(xs))[None, :]  # [K, W]
    focal = (w / 2.0) / math.tan(half_fov)
    # LOOK_UP/DOWN shifts the horizon row (gridworld.py:400-402); a static
    # zero tilt (R2R's 4-action space) compiles the shift away entirely
    if isinstance(tilt, (int, float)) and float(tilt) == 0.0:
        horizon = h / 2.0
    else:
        horizon = h / 2.0 + jnp.tan(jnp.asarray(tilt, jnp.float32)) * focal
    safe_perp = jnp.maximum(perp, 1e-6)
    top = horizon - focal * (_WALL_HEIGHT - _EYE) / safe_perp  # [K, W]
    bot = horizon + focal * _EYE / safe_perp
    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]  # [1, H, 1]
    wall_mask = (rows >= top[:, None, :]) & (rows <= bot[:, None, :]) & hit[:, None, :]

    if spec.kind == "depth":
        below = rows > horizon  # [1, H, 1]
        denom = jnp.abs(rows - horizon) + 1e-6
        plane_h = jnp.where(below, _EYE, _WALL_HEIGHT - _EYE)
        plane_depth = focal * plane_h / denom  # [1, H, 1]
        depth = jnp.where(
            wall_mask, perp[:, None, :], jnp.minimum(plane_depth, spec.max_depth)
        )
        depth = jnp.clip(depth, spec.min_depth, spec.max_depth)
        if spec.normalize_depth:
            depth = (depth - spec.min_depth) / (spec.max_depth - spec.min_depth)
        return depth.astype(jnp.float32)[..., None]  # [K, H, W, 1]

    colors = jnp.stack(
        [_grid_lookup(wall_colors[..., c], hit_ci, hit_cj) for c in range(3)], axis=-1
    ).reshape(K, w, 3)  # float32 holding exact uint8 values
    shade = jnp.clip(1.0 - perp / world_size, 0.25, 1.0)
    wall_rgb = (colors * shade[..., None]).astype(jnp.uint8)
    img = jnp.where(
        (rows > horizon)[..., None],
        floor_color[None, None, None, :],
        ceil_color[None, None, None, :],
    ).astype(jnp.uint8)  # [1, H, 1, 3] broadcast
    img = jnp.broadcast_to(img, (K, h, w, 3))
    return jnp.where(wall_mask[..., None], wall_rgb[:, None, :, :], img)


def render_camera(
    scene_occ: jnp.ndarray,
    wall_colors: jnp.ndarray,
    floor_color: jnp.ndarray,
    ceil_color: jnp.ndarray,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    spec: CameraSpec,
    tilt: jnp.ndarray | float = 0.0,
    origin=None,
) -> jnp.ndarray:
    """One frame for one camera (single-orientation group)."""
    return render_camera_group(
        scene_occ, wall_colors, floor_color, ceil_color, pos, heading,
        (spec.orientation_y,), spec, tilt=tilt, origin=origin,
    )[0]


def render_arrays(
    occupancy: jnp.ndarray,
    wall_colors: jnp.ndarray,
    floor_color: jnp.ndarray,
    ceil_color: jnp.ndarray,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    specs: Sequence[CameraSpec],
    tilt: Optional[jnp.ndarray] = None,
    origin: Optional[jnp.ndarray] = None,  # [B, 2] or None (all-zero)
) -> Dict[str, jnp.ndarray]:
    """All cameras for all envs: obs dict of [B, H, W, C] arrays.

    Same-spec cameras (a pano rig) share ONE raycast per env — the host's
    camera grouping (gridworld.py:332-340), which also keeps the compiled
    graph at one render program per camera kind."""
    groups: Dict[Tuple, List[CameraSpec]] = {}
    for spec in specs:
        key = spec._replace(uuid="", orientation_y=0.0)
        groups.setdefault(key, []).append(spec)
    if origin is None:
        origin = jnp.zeros((pos.shape[0], 2), jnp.float32)
    obs = {}
    for key, members in groups.items():
        orientations = tuple(m.orientation_y for m in members)
        if tilt is None:
            fn = lambda o, wc, fc, cc, p, hd, og: render_camera_group(
                o, wc, fc, cc, p, hd, orientations, members[0], origin=og
            )
            frames = jax.vmap(fn)(
                occupancy, wall_colors, floor_color, ceil_color, pos, heading, origin
            )  # [B, K, H, W, C]
        else:
            fn = lambda o, wc, fc, cc, p, hd, tl, og: render_camera_group(
                o, wc, fc, cc, p, hd, orientations, members[0], tilt=tl, origin=og
            )
            frames = jax.vmap(fn)(
                occupancy, wall_colors, floor_color, ceil_color, pos, heading, tilt, origin
            )
        for k, m in enumerate(members):
            obs[m.uuid] = frames[:, k]
    return obs


def render_batch(
    scenes: SceneBatch,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    specs: Sequence[CameraSpec],
    tilt: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    return render_arrays(
        scenes.occupancy, scenes.wall_colors, scenes.floor_color,
        scenes.ceil_color, pos, heading, specs, tilt=tilt,
        origin=scenes.origin_xz,
    )


def progress_batch(scenes: SceneBatch, pos: jnp.ndarray) -> jnp.ndarray:
    """VLNOracleProgressSensor on device: (d0 - d_t)/d0, 0 when unreachable
    (tasks/sensors.py:120-133)."""
    d_t = jax.vmap(geodesic_at)(scenes.goal_field, pos, scenes.origin_xz)
    prog = (scenes.d0 - d_t) / scenes.d0
    return jnp.where(jnp.isfinite(d_t), prog, 0.0)[:, None].astype(jnp.float32)


def step_batch(
    scenes: SceneBatch,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    actions: jnp.ndarray,
    forward_step: float,
    turn_angle: float,
    allow_sliding: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    fn = lambda occ, p, h, a, og: step_discrete(
        occ, p, h, a, forward_step, turn_angle, allow_sliding, og
    )
    return jax.vmap(fn)(scenes.occupancy, pos, heading, actions, scenes.origin_xz)
