"""Interactive live viewer — manual control AND policy-eval mode.

Covers two reference modes:

* `mode == "debug"` (`main.py:32-85,136-146` + `event_handler.py`): arrow
  keys map to rotor-action pairs exactly as `_manual_control`
  (`main.py:49-60`): RIGHT=[1,-1], LEFT=[-1,1], UP=[1,1], DOWN=[-1,-1],
  no key=[-1,-1] (both rotors idle); S saves a screenshot; ESC/close quits.
* `mode == "eval"` (`main.py:212-241`): pass `--agent <npz|ckpt-dir>` and a
  LOADED policy flies while you watch live (stochastic like the reference's
  `model.predict`, or `--deterministic`).

Live diagnostics mirror the reference's in-env render
(`drone_2d_env.py:788-894`): reward-component text (`--render-text`),
velocity / lookahead / nearest-obstacle vectors with the red/orange/green
CA-state color logic, motor-force bars, drone shade trail
(`--render-shade`, honoring `--shade-distance`), the flight path
(`--render-path`), and the test-mode spawn rectangle.

Auto-resets on done.  The env steps on-device (single env, jitted); frames
render host-side from the returned state — the TPU-native split of the
reference's in-env pygame loop.  `--gif-out` records the session headlessly
(SDL_VIDEODRIVER=dummy) for docs and smoke tests.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenario", default=None,
                   help="spatial scenario or stage_k; default: curriculum stage_1")
    p.add_argument("--agent", default=None,
                   help=".npz params, orbax checkpoint dir, or 'random' — the "
                        "policy flies (reference eval mode, main.py:212-241); "
                        "omit for keyboard control")
    p.add_argument("--deterministic", action="store_true",
                   help="policy mean instead of sampling (with --agent)")
    p.add_argument("--fps", type=int, default=60)
    p.add_argument("--screenshot-dir", default="screenshots")
    p.add_argument("--max-frames", type=int, default=0,
                   help="exit after N frames (0 = run until ESC; useful headless)")
    p.add_argument("--gif-out", default=None,
                   help="record every 2nd frame to this GIF (works headless)")
    _bool = lambda s: s.lower() in ("1", "true", "yes")
    p.add_argument("--render-text", type=_bool, default=True, metavar="BOOL",
                   help="reward-component text overlay (drone_2d_env.py:788-819)")
    p.add_argument("--render-path", type=_bool, default=True, metavar="BOOL",
                   help="flight-path trail (drone_2d_env.py:898-900)")
    p.add_argument("--render-shade", type=_bool, default=False, metavar="BOOL",
                   help="drone shade trail (drone_2d_env.py:870-875)")
    p.add_argument("--shade-distance", type=float, default=75.0)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import pygame

    from drone2d_tpu.config import EnvConfig
    from drone2d_tpu.env.env import Drone2DEnv
    from drone2d_tpu.eval.render import SceneRenderer, _flip

    render_kw = dict(
        render_sim=True, render_text=args.render_text,
        render_path=args.render_path, render_shade=args.render_shade,
        shade_distance=args.shade_distance,
    )
    if args.scenario and not args.scenario.startswith("stage_"):
        cfg = EnvConfig(mode="test", scenario=args.scenario, **render_kw)
    else:
        cfg = EnvConfig(
            mode="curriculum", scenario=args.scenario or "stage_1", **render_kw
        )
    env = Drone2DEnv(cfg)
    step = jax.jit(env.step)
    reset = jax.jit(env.reset)

    policy = None
    if args.agent:
        from drone2d_tpu.eval.run import load_params
        from drone2d_tpu.models.policy import policy_value, sample_action

        params = load_params(args.agent)

        if params is None:  # 'random'
            def policy(obs, k):
                return jax.random.uniform(k, (2,), minval=-1.0, maxval=1.0)
        elif args.deterministic:
            def policy(obs, k):
                mean, _, _ = policy_value(params, obs)
                return jnp.clip(mean, -1.0, 1.0)
        else:
            def policy(obs, k):
                a, _, _ = sample_action(params, obs, k)
                return jnp.clip(a, -1.0, 1.0)
        policy = jax.jit(policy)

    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    state, obs = reset(k0)

    pygame.init()
    screen = pygame.display.set_mode((int(cfg.screensize_x), int(cfg.screensize_y)))
    pygame.display.set_caption("Drone2d Environment (drone2d_tpu debug)")
    clock = pygame.time.Clock()
    renderer = SceneRenderer(cfg)
    renderer.reset_shades()
    gif_frames: list = []

    # curriculum mode: scene geometry is per-episode state
    def scene_layers(state):
        if cfg.mode == "test":
            return None, None
        n = int(np.asarray(state.path.n_wps))
        from drone2d_tpu.utils.host_path import HostQPMI

        host = HostQPMI(np.asarray(state.path.wps)[:n])
        obstacles = (
            np.asarray(state.obstacles.xy),
            np.asarray(state.obstacles.r),
            np.asarray(state.obstacles.mask),
        )
        return host.coords(100), obstacles

    path_coords, obstacles = scene_layers(state)
    trail = []
    frames = 0
    running = True
    while running:
        action = jnp.array([-1.0, -1.0])
        for event in pygame.event.get():
            if event.type == pygame.QUIT:
                running = False
            elif event.type == pygame.MOUSEBUTTONDOWN and cfg.change_target:
                # click-to-retarget (reference event_handler.py:5-13; that
                # code hard-codes `800 - y` against a 1300-px screen — a
                # stale-constant quirk we fix by using the real height)
                mx, my = event.pos
                state = state._replace(
                    target=jnp.asarray(
                        [float(mx), cfg.screensize_y - float(my)], jnp.float32
                    )
                )
        keys = pygame.key.get_pressed()
        if keys[pygame.K_ESCAPE]:
            running = False
        elif keys[pygame.K_RIGHT]:
            action = jnp.array([1.0, -1.0])
        elif keys[pygame.K_LEFT]:
            action = jnp.array([-1.0, 1.0])
        elif keys[pygame.K_UP]:
            action = jnp.array([1.0, 1.0])
        elif keys[pygame.K_DOWN]:
            action = jnp.array([-1.0, -1.0])
        if keys[pygame.K_s]:
            os.makedirs(args.screenshot_dir, exist_ok=True)
            pygame.image.save(
                screen, os.path.join(args.screenshot_dir, f"frame_{frames}.png")
            )

        if policy is not None:
            key, k_act = jax.random.split(key)
            action = policy(obs, k_act)

        out = step(state, action)
        state, obs = out.state, out.obs
        pos = np.asarray(state.body.pos)
        if args.render_path:
            trail.append((float(pos[0]), _flip(float(pos[1]), cfg.screensize_y)))
        if args.render_shade:
            renderer.maybe_add_shade(
                pos, float(np.asarray(state.body.angle)), cfg.shade_distance
            )

        renderer.draw_scene(path_coords, obstacles)
        if cfg.mode == "test":
            renderer.draw_spawn_rect(np.asarray(env._spawn_rect))
        if args.render_shade:
            renderer.draw_shades()
        if len(trail) > 2:
            renderer.draw_flight_path(trail, (16, 19, 97))
        renderer.draw_drone(pos, float(np.asarray(state.body.angle)))
        renderer.draw_diagnostics(state, obs)
        if args.render_text:
            renderer.draw_reward_text(out.info)
        screen.blit(renderer.surface, (0, 0))
        pygame.display.flip()
        if args.gif_out and frames % 2 == 0:  # main.py:293-295 cadence
            gif_frames.append(renderer.frame())
        clock.tick(args.fps)
        frames += 1

        if bool(np.asarray(out.done)):
            key, k0 = jax.random.split(key)
            state, obs = reset(k0)
            path_coords, obstacles = scene_layers(state)
            trail = []
            renderer.reset_shades()
        if args.max_frames and frames >= args.max_frames:
            running = False
    pygame.quit()
    if args.gif_out and gif_frames:
        import imageio

        os.makedirs(os.path.dirname(args.gif_out) or ".", exist_ok=True)
        imageio.mimsave(args.gif_out, gif_frames, fps=30)
        print(f"wrote {args.gif_out} ({len(gif_frames)} frames)")


if __name__ == "__main__":
    main()
