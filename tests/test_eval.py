"""Eval harness tests: vectorized episode campaigns, artifact schema parity
with the reference Tests/ layout, offline replotting, barplot tables."""

import json
import os
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.eval.artifacts import write_campaign
from drone2d_tpu.eval.episode import run_episodes

SMALL = dict(path_table_n=128, n_steps=64)


@pytest.fixture(scope="module")
def campaign():
    cfg = EnvConfig(mode="test", scenario="large", **SMALL)
    results = run_episodes(cfg, None, jax.random.PRNGKey(0), 6)
    return cfg, results


def test_run_episodes_shapes_and_invariants(campaign):
    cfg, r = campaign
    n = 6
    assert r.traj.shape == (n, cfg.n_steps, 2)
    assert r.angles.shape == (n, cfg.n_steps)
    # every episode ends exactly one way or times out
    assert np.all((r.success.astype(int) + r.fail.astype(int)) == 1)
    assert np.all(r.time_steps >= 1) and np.all(r.time_steps <= cfg.n_steps)
    assert np.all(r.traj_len >= 1) and np.all(r.traj_len <= cfg.n_steps)
    assert np.all(np.isfinite(r.ape)) and np.all(np.isfinite(r.total_reward))
    # collisions imply failure
    assert np.all(r.fail[r.collision > 0])


def test_run_episodes_multi_matches_single():
    """Batched multi-agent eval (vmap over agents) must reproduce the
    single-agent path bit-for-bit when given the same episode keys."""
    from drone2d_tpu.eval.episode import run_episodes_multi
    from drone2d_tpu.models.policy import init_actor_critic

    cfg = EnvConfig(mode="test", scenario="large", **SMALL)
    p0 = init_actor_critic(jax.random.PRNGKey(1), 27, 2)
    p1 = init_actor_critic(jax.random.PRNGKey(2), 27, 2)
    stack = jax.tree.map(lambda *x: jnp.stack(x), p0, p0, p1)
    key = jax.random.PRNGKey(5)

    multi = run_episodes_multi(cfg, stack, key, 4, same_episodes=True)
    assert multi.success.shape == (3, 4)
    assert multi.traj.shape == (3, 4, cfg.n_steps, 2)

    # identical agents in the same program: bit-identical rows
    np.testing.assert_array_equal(multi.traj[0], multi.traj[1])
    np.testing.assert_array_equal(multi.total_reward[0], multi.total_reward[1])
    # a different agent on the same episodes actually behaves differently
    assert not np.array_equal(multi.traj[0], multi.traj[2])

    # vs the single-agent path: the (A, N) program compiles to different
    # fusions than the (N,) program, so bitwise parity is not guaranteed and
    # chaotic dynamics amplify rounding — check outcome-level agreement.
    for i, p in ((0, p0), (2, p1)):
        single = run_episodes(cfg, p, key, 4)
        np.testing.assert_array_equal(multi.success[i], single.success)
        np.testing.assert_array_equal(multi.fail[i], single.fail)
        np.testing.assert_array_equal(multi.time_steps[i], single.time_steps)
        np.testing.assert_allclose(multi.total_reward[i], single.total_reward,
                                   rtol=1e-4)
        np.testing.assert_allclose(multi.traj[i], single.traj, atol=5.0)

    # independent-episode mode draws different keys per agent
    indep = run_episodes_multi(cfg, stack, key, 4, same_episodes=False)
    assert indep.success.shape == (3, 4)


def test_flight_paths_screen_coords(campaign):
    cfg, r = campaign
    fps = r.flight_paths(cfg.screensize_y)
    assert len(fps) == 6
    i = int(np.argmax(r.traj_len))
    assert len(fps[i]) == int(r.traj_len[i])
    x, y_screen = fps[i][0]
    # y flip: screen_y = h - world_y (drone_2d_env.py:986)
    assert y_screen == pytest.approx(cfg.screensize_y - r.traj[i, 0, 1], abs=1e-4)


def test_write_campaign_schema(campaign, tmp_path):
    cfg, r = campaign
    out = write_campaign(
        cfg, r, agent="agent_7", agent_path="x.npz",
        root=str(tmp_path / "Tests"), gif_root=str(tmp_path / "Gifs"),
    )
    assert sorted(os.listdir(out)) == [
        "apes.npy", "collisions.npy", "flight_paths",
        "large_7_results.txt", "rewards.npy", "time_spent.npy",
    ]
    txt = open(os.path.join(out, "large_7_results.txt")).read()
    for label in ("Successes", "Fails", "Collisions", "Success rate",
                  "Collision rate", "Average APE", "Average flight time",
                  "Agent path"):
        assert re.search(rf"^{label}: ", txt, re.M), label
    sr = float(re.search(r"Success rate: ([\d.]+)", txt).group(1))
    assert sr == pytest.approx(float(np.sum(r.success)) / 6)
    with open(os.path.join(out, "flight_paths")) as f:
        fps = json.load(f)
    assert len(fps) == 6
    # overlay plot + gif
    plots = os.path.join(os.path.dirname(out), "plots")
    assert os.listdir(plots) == ["large_7.png"]
    assert os.path.exists(tmp_path / "Gifs" / "agent_7" / "large.gif")
    # second campaign for the same scenario bumps test_k (main.py:297-302)
    out2 = write_campaign(
        cfg, r, agent="agent_7", agent_path="x.npz",
        root=str(tmp_path / "Tests"), gif_root=None,
    )
    assert "test_1" in out2 and "test_0" in out


def test_replotting_roundtrip(campaign, tmp_path):
    cfg, r = campaign
    out = write_campaign(
        cfg, r, agent="agent_9", agent_path="x.npz",
        root=str(tmp_path / "Tests"), gif_root=None,
    )
    from drone2d_tpu.eval.replotting import replot

    png = tmp_path / "replot.png"
    replot(out, "large", str(png))
    assert png.exists() and png.stat().st_size > 1000


def test_stage_scenario_episodes():
    cfg = EnvConfig(mode="curriculum", scenario="stage_3", **SMALL)
    r = run_episodes(cfg, None, jax.random.PRNGKey(1), 4)
    assert np.all((r.success.astype(int) + r.fail.astype(int)) == 1)


def test_barplot_tables_match_reference():
    """The mirrored tables must equal barplots.py:6-29 (spot checks from
    BASELINE.md)."""
    from drone2d_tpu.eval.barplots import SCENARIO_DATA, STAGES_DATA

    s = SCENARIO_DATA
    assert s["scenario"][3] == "S-parallel"
    assert s["reactive"]["SR"] == [88, 71, 55, 3, 28, 71, 0]
    assert s["static"]["AAPE"][5] == 44
    assert STAGES_DATA["reactive"]["SR"] == [100, 96, 94, 48, 49]


def test_load_campaign_data(campaign, tmp_path):
    cfg, r = campaign
    write_campaign(
        cfg, r, agent="agent_3", agent_path="x.npz",
        root=str(tmp_path / "Tests"), gif_root=None,
    )
    from drone2d_tpu.eval.barplots import load_campaign_data

    data = load_campaign_data(str(tmp_path / "Tests"), "agent_3")
    assert data["scenario"] == ["large"]
    assert data["agent"]["SR"][0] == pytest.approx(
        100 * float(np.sum(r.success)) / 6
    )


def test_param_npz_roundtrip(tmp_path):
    from drone2d_tpu.models.policy import (
        flat_dict_to_params, init_actor_critic, params_to_flat_dict,
    )

    params = init_actor_critic(jax.random.PRNGKey(0), 27, 2)
    flat = {k: np.asarray(v) for k, v in params_to_flat_dict(params).items()}
    np.savez(tmp_path / "p.npz", **flat)
    with np.load(tmp_path / "p.npz") as z:
        restored = flat_dict_to_params(dict(z))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_render_diagnostics_overlay(tmp_path):
    """Headless smoke test of the live-diagnostics layer (VERDICT r1 next #3):
    vectors/arcs/text/spawn-rect/shades render without error and actually
    change pixels on the scene."""
    from drone2d_tpu.config import EnvConfig
    from drone2d_tpu.env.env import Drone2DEnv
    from drone2d_tpu.eval.render import SceneRenderer

    cfg = EnvConfig(
        mode="test", scenario="large", path_table_n=128,
        render_text=True, render_shade=True, shade_distance=10.0,
    )
    env = Drone2DEnv(cfg)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    out = jax.jit(env.step)(state, jnp.array([0.3, 0.3]))

    r = SceneRenderer(cfg)
    r.reset_shades()
    r.draw_scene()
    base = r.frame().copy()
    r.draw_spawn_rect(np.asarray(env._spawn_rect))
    r.maybe_add_shade(np.asarray(out.state.body.pos),
                      float(np.asarray(out.state.body.angle)), cfg.shade_distance)
    # second pose far enough away to trigger a second shade
    r.maybe_add_shade(np.asarray(out.state.body.pos) + 50.0, 0.5, cfg.shade_distance)
    assert len(r._shades) == 2
    r.draw_shades()
    r.draw_drone(np.asarray(out.state.body.pos),
                 float(np.asarray(out.state.body.angle)))
    r.draw_diagnostics(out.state, out.obs)
    r.draw_reward_text(out.info)
    overlaid = r.frame()
    assert overlaid.shape == base.shape
    assert (overlaid != base).any()
    r.save_png(str(tmp_path / "overlay.png"))
    assert (tmp_path / "overlay.png").exists()


def test_debug_viewer_policy_mode_headless(tmp_path):
    """The live eval viewer (debug --agent, reference main.py:212-241) runs
    headless end-to-end and records a GIF."""
    import os

    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from drone2d_tpu import debug

    gif = str(tmp_path / "eval.gif")
    debug.main([
        "--agent", "random", "--scenario", "large", "--max-frames", "6",
        "--gif-out", gif, "--render-shade", "true", "--fps", "1000",
    ])
    assert os.path.exists(gif)


def test_campaign_gif_spans_all_episodes(campaign, tmp_path):
    """gif_all_episodes=True reproduces the reference's test-mode GIF, which
    concatenates frames across ALL campaign episodes (main.py:259-295): the
    whole-campaign GIF must carry every episode's every-2nd-frame count."""
    import imageio

    cfg, r = campaign
    write_campaign(
        cfg, r, agent="agent_8", agent_path="x.npz",
        root=str(tmp_path / "Tests"), gif_root=str(tmp_path / "Gifs"),
        gif_all_episodes=True,
    )
    gif = tmp_path / "Gifs" / "agent_8" / "large.gif"
    n_frames = len(imageio.mimread(gif, memtest=False))
    expect = sum(len(range(0, int(n), 2)) for n in r.traj_len)
    longest = max(len(range(0, int(n), 2)) for n in r.traj_len)
    # GIF encoding may merge identical consecutive frames, so allow a small
    # deficit — but the campaign GIF must clearly span beyond ANY single
    # episode and reach ~the full frame budget
    assert longest < n_frames <= expect, (n_frames, expect, longest)
    assert n_frames >= 0.9 * expect, (n_frames, expect)
