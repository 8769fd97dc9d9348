"""End-to-end forward tests for the three policy families (small encoders
for test speed)."""

import numpy as np
import pytest
from gymnasium import spaces

import jax
import jax.numpy as jnp

from vlnce_tpu.config import get_config

IMG = 32
SMALL_OPTS = [
    "MODEL.DEPTH_ENCODER.backbone", "resnet18",
    "MODEL.RGB_ENCODER.cnn_type", "TorchVisionResNet18",
    "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", False,
]


def il_obs_space():
    return spaces.Dict({
        "rgb": spaces.Box(0, 255, (IMG, IMG, 3), np.uint8),
        "depth": spaces.Box(0, 1, (IMG, IMG, 1), np.float32),
        "instruction": spaces.Box(0, 10000, (64,), np.int32),
        "progress": spaces.Box(0, 1, (1,), np.float32),
    })


def make_obs(space, B):
    rng = np.random.RandomState(0)
    obs = {}
    for k, s in space.spaces.items():
        if s.dtype == np.uint8:
            obs[k] = jnp.asarray(rng.randint(0, 255, (B,) + s.shape, dtype=np.uint8))
        elif k == "instruction":
            arr = np.zeros((B,) + s.shape, np.int32)
            arr[:, :7] = rng.randint(1, 100, (B, 7))
            obs[k] = jnp.asarray(arr)
        else:
            obs[k] = jnp.asarray(rng.rand(B, *s.shape).astype(np.float32))
    return obs


@pytest.mark.parametrize("policy_name", ["Seq2SeqPolicy", "CMAPolicy"])
def test_il_policy_forward_and_sequence(policy_name):
    from vlnce_tpu.registry import registry
    import vlnce_tpu.models  # noqa: F401

    cfg = get_config(opts=SMALL_OPTS + ["MODEL.PROGRESS_MONITOR.use", True])
    space = il_obs_space()
    pol = registry.get_policy(policy_name).from_config(cfg, space, spaces.Discrete(4))
    pol.init_params(jax.random.PRNGKey(0), batch_size=2)

    B = 2
    obs = make_obs(space, B)
    st = pol.initial_rnn_states(B)
    a, st2 = pol.act(obs, st, jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1)), deterministic=True)
    assert a.shape == (B, 1)
    assert 0 <= int(a[0, 0]) < 4
    assert st2.shape == st.shape

    # deterministic act must be invariant to rng
    a2, _ = pol.act(obs, st, jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1)), deterministic=True,
                    rng=jax.random.PRNGKey(99))
    assert np.array_equal(np.asarray(a), np.asarray(a2))

    # sequence mode: T=3
    T = 3
    obs_seq = {k: jnp.concatenate([v] * T, axis=0) for k, v in obs.items()}
    logits, _, aux = pol.build_distribution_logits(
        obs_seq, st, jnp.zeros((T * B, 1), jnp.int32), jnp.ones((T * B, 1)), T=T
    )
    assert logits.shape == (T * B, 4)
    assert "progress_monitor" in aux
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.slow  # >25s compile-heavy; full tier: pytest -m ""
def test_sequence_forward_matches_stepwise():
    """The T-step scan must equal stepping one-by-one (masked-RNN parity at
    the full-policy level)."""
    from vlnce_tpu.models.cma_policy import CMAPolicy

    cfg = get_config(opts=SMALL_OPTS)
    space = il_obs_space()
    pol = CMAPolicy.from_config(cfg, space, spaces.Discrete(4))
    pol.init_params(jax.random.PRNGKey(0), batch_size=1)

    B, T = 1, 4
    rng = np.random.RandomState(5)
    step_obs = []
    for t in range(T):
        o = make_obs(space, B)
        o["rgb"] = jnp.asarray(rng.randint(0, 255, (B, IMG, IMG, 3), dtype=np.uint8))
        step_obs.append(o)

    # stepwise
    st = pol.initial_rnn_states(B)
    prev_a = jnp.zeros((B, 1), jnp.int32)
    logits_steps = []
    for t in range(T):
        mask = jnp.zeros((B, 1)) if t == 0 else jnp.ones((B, 1))
        logits, st, _ = pol.module.apply({"params": pol.params}, step_obs[t], st, prev_a, mask)
        a = jnp.argmax(logits, axis=-1, keepdims=True)
        logits_steps.append(np.asarray(logits))
        prev_a = a

    # sequence (teacher-forced with the same prev_actions)
    obs_seq = {k: jnp.concatenate([step_obs[t][k] for t in range(T)], axis=0) for k in step_obs[0]}
    prev_actions = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32)] + [jnp.argmax(jnp.asarray(l), -1, keepdims=True) for l in logits_steps[:-1]],
        axis=0,
    )
    masks = jnp.asarray(np.concatenate([np.zeros((B, 1)), np.ones(((T - 1) * B, 1))], 0))
    logits_seq, _, _ = pol.build_distribution_logits(obs_seq, pol.initial_rnn_states(B), prev_actions, masks, T=T)
    np.testing.assert_allclose(np.asarray(logits_seq), np.concatenate(logits_steps, 0), atol=1e-4)


def test_waypoint_policy_act_eval_consistency():
    from vlnce_tpu.models.waypoint_policy import WaypointPolicy

    P = 12
    space = spaces.Dict({
        "rgb": spaces.Box(0, 255, (P, IMG, IMG, 3), np.uint8),
        "depth": spaces.Box(0, 1, (P, IMG, IMG, 1), np.float32),
        "rgb_history": spaces.Box(0, 255, (IMG, IMG, 3), np.uint8),
        "depth_history": spaces.Box(0, 1, (IMG, IMG, 1), np.float32),
        "instruction": spaces.Box(0, 10000, (64,), np.int32),
        "angle_features": spaces.Box(-1, 1, (P, 4), np.float32),
    })
    cfg = get_config(opts=SMALL_OPTS + ["MODEL.policy_name", "WaypointPolicy"])
    pol = WaypointPolicy.from_config(cfg, space)
    pol.init_params(jax.random.PRNGKey(0), batch_size=2)

    B = 2
    obs = make_obs(space, B)
    st = pol.initial_rnn_states(B)
    pa = pol.initial_prev_actions(B)
    out = pol.act(obs, st, pa, jnp.ones((B, 1)), rng=jax.random.PRNGKey(3))

    assert out["r"].shape == (B, 1)
    r = np.asarray(out["r"]).ravel()
    assert np.all(r >= 0.25 - 1e-6) and np.all(r <= 2.75 + 1e-6)
    th = np.asarray(out["theta"]).ravel()
    assert np.all(th >= 0) and np.all(th < 2 * np.pi)

    v, lp, ent, st2 = pol.evaluate_actions(obs, st, pa, jnp.ones((B, 1)), out["action_elements"])
    np.testing.assert_allclose(np.asarray(lp), np.asarray(out["action_log_probs"]), atol=1e-4)
    assert set(ent) == {"pano", "offset", "distance"}
    acts = WaypointPolicy.actions_to_env(out)
    assert len(acts) == B


@pytest.mark.slow  # two CMA grad-graph compiles; full tier: pytest -m ""
def test_encoder_remat_is_semantically_invisible():
    """MODEL.{RGB,DEPTH}_ENCODER.remat (jax.checkpoint on the conv backbones)
    must not change the param tree, forward outputs, or gradients — it only
    trades backward-pass recompute for activation memory."""
    from vlnce_tpu.registry import registry
    import vlnce_tpu.models  # noqa: F401

    space = il_obs_space()
    B = 2

    def build(remat: bool):
        cfg = get_config(opts=SMALL_OPTS + [
            "MODEL.RGB_ENCODER.trainable", True,
            "MODEL.DEPTH_ENCODER.trainable", True,
            "MODEL.RGB_ENCODER.remat", remat,
            "MODEL.DEPTH_ENCODER.remat", remat,
        ])
        pol = registry.get_policy("CMAPolicy").from_config(cfg, space, spaces.Discrete(4))
        pol.init_params(jax.random.PRNGKey(0), batch_size=B)
        return pol

    base, rem = build(False), build(True)
    flat_b = jax.tree_util.tree_leaves_with_path(base.params)
    flat_r = jax.tree_util.tree_leaves_with_path(rem.params)
    assert [p for p, _ in flat_b] == [p for p, _ in flat_r]  # identical tree
    for (_, a), (_, b) in zip(flat_b, flat_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    obs = make_obs(space, B)
    st = base.initial_rnn_states(B)
    prev = jnp.zeros((B, 1), jnp.int32)
    masks = jnp.ones((B, 1), jnp.float32)

    def loss(pol, params):
        logits, _, _ = pol.module.apply({"params": params}, obs, st, prev, masks)
        return jnp.sum(jax.nn.log_softmax(logits)[:, 0])

    # jit the grad programs: eager value_and_grad of a full policy dispatches
    # thousands of single ops (~80s warm on a 1-core host); jitted it is two
    # persistent-cacheable programs
    lb, gb = jax.jit(jax.value_and_grad(lambda p: loss(base, p)))(base.params)
    lr, gr = jax.jit(jax.value_and_grad(lambda p: loss(rem, p)))(rem.params)
    np.testing.assert_allclose(float(lb), float(lr), rtol=1e-6)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gb),
        jax.tree_util.tree_leaves_with_path(gr),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                                   err_msg=str(pa))
