"""Interactive manual-control mode (reference `mode == "debug"`,
`main.py:32-85,136-146` + `event_handler.py`).

    python -m drone2d_tpu.debug [--scenario large] [--steps-per-frame 1]

Arrow keys map to rotor-action pairs exactly as `_manual_control`
(`main.py:49-60`): RIGHT=[1,-1], LEFT=[-1,1], UP=[1,1], DOWN=[-1,-1],
no key=[-1,-1] (both rotors idle); S saves a screenshot; ESC/close quits.
Auto-resets on done.  The env steps on-device (single env, jitted); frames
render host-side from the returned state — the TPU-native split of the
reference's in-env pygame loop.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenario", default=None,
                   help="spatial scenario for mode=test; default: curriculum stage_1")
    p.add_argument("--fps", type=int, default=60)
    p.add_argument("--screenshot-dir", default="screenshots")
    p.add_argument("--max-frames", type=int, default=0,
                   help="exit after N frames (0 = run until ESC; useful headless)")
    args = p.parse_args(argv)

    import pygame

    from drone2d_tpu.config import EnvConfig
    from drone2d_tpu.env.env import Drone2DEnv
    from drone2d_tpu.eval.render import SceneRenderer, _flip

    if args.scenario:
        cfg = EnvConfig(mode="test", scenario=args.scenario)
    else:
        cfg = EnvConfig(mode="curriculum", scenario="stage_1")
    env = Drone2DEnv(cfg)
    step = jax.jit(env.step)
    reset = jax.jit(env.reset)

    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    state, obs = reset(k0)

    pygame.init()
    headless = os.environ.get("SDL_VIDEODRIVER") == "dummy"
    screen = pygame.display.set_mode((int(cfg.screensize_x), int(cfg.screensize_y)))
    pygame.display.set_caption("Drone2d Environment (drone2d_tpu debug)")
    clock = pygame.time.Clock()
    renderer = SceneRenderer(cfg)

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

        out = step(state, action)
        state = out.state
        pos = np.asarray(state.body.pos)
        trail.append((float(pos[0]), _flip(float(pos[1]), cfg.screensize_y)))

        renderer.draw_scene(path_coords, obstacles)
        if len(trail) > 2:
            renderer.draw_flight_path(trail, (16, 19, 97))
        renderer.draw_drone(pos, float(np.asarray(state.body.angle)))
        screen.blit(renderer.surface, (0, 0))
        pygame.display.flip()
        clock.tick(args.fps)
        frames += 1

        if bool(np.asarray(out.done)):
            key, k0 = jax.random.split(key)
            state, obs = reset(k0)
            path_coords, obstacles = scene_layers(state)
            trail = []
        if args.max_frames and frames >= args.max_frames:
            running = False
    pygame.quit()


if __name__ == "__main__":
    main()
