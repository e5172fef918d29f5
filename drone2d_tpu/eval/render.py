"""Host-side replay rendering — scenario scenes, flight-path overlays, GIFs.

The reference renders live inside the env (pygame window, drone_2d_env.py:
775-906) and grabs frames during evaluation (main.py:267-270).  TPU-first,
rendering never touches the device path: episodes are logged as trajectory
arrays and replayed here with headless pygame surfaces.

Replicates: the flight-path overlay plot with red-blue reward gradient and
colorbar (main.py:329-400 + red_blue_grad at main.py:18-29), the episode GIF
(main.py:293-295: every 2nd frame at 30 fps), and the scene drawing (path
polyline, waypoint dots, obstacle circles, drone boxes).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")  # headless
import pygame  # noqa: E402

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.env import scenarios as scen_mod

BG = (243, 243, 243)
PATH_COLOR = (0, 0, 0)
OBSTACLE_COLOR = (67, 81, 116)  # pymunk debug-draw default-ish shape color
FRAME_COLOR = (66, 135, 245)
MOTOR_COLOR = (33, 33, 33)


def red_blue_grad(x: float) -> Tuple[float, float, float]:
    """0 -> red, 1 -> blue (reference main.py:18-29)."""
    if x < 0.5:
        return (255, 0, 255 * x * 2)
    return (255 * (1 - x) * 2, 0, 255)


def _flip(y: float, h: float) -> float:
    return h - y  # pygame y grows downward; world y grows up


class SceneRenderer:
    """Draws one scenario's static scene + dynamic drone/trajectory layers."""

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg
        self.w = int(cfg.screensize_x)
        self.h = int(cfg.screensize_y)
        pygame.init()
        self.surface = pygame.Surface((self.w, self.h))
        self.geometry = None
        if cfg.mode == "test":
            self.geometry = scen_mod.build_test_scenario(cfg)

    # -- static scene --------------------------------------------------------

    def draw_scene(
        self,
        path_coords: Optional[np.ndarray] = None,
        obstacles: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    ) -> None:
        """Fill background, draw path + endpoint dots + obstacles.

        Defaults to the constructed test-scenario geometry; curriculum
        replays pass explicit per-episode (path_coords, obstacles)."""
        s, h = self.surface, float(self.h)
        s.fill(BG)

        if path_coords is None and self.geometry is not None:
            from drone2d_tpu.utils.host_path import HostQPMI

            host = HostQPMI(self.geometry.wps[: self.geometry.n_wps])
            path_coords = host.coords(100)
        if path_coords is not None and len(path_coords) > 1:
            pts = [(float(x), _flip(float(y), h)) for x, y in path_coords]
            pygame.draw.circle(s, PATH_COLOR, pts[0], 5)
            pygame.draw.circle(s, PATH_COLOR, pts[-1], 5)
            pygame.draw.aalines(s, PATH_COLOR, False, pts)

        if obstacles is None and self.geometry is not None:
            g = self.geometry
            obstacles = (g.obs_xy, g.obs_r, g.obs_mask)
        if obstacles is not None:
            xy, r, mask = obstacles
            for i in range(len(r)):
                if mask[i]:
                    pygame.draw.circle(
                        s, OBSTACLE_COLOR,
                        (float(xy[i, 0]), _flip(float(xy[i, 1]), h)),
                        float(r[i]),
                    )

    # -- dynamic layers ------------------------------------------------------

    def draw_drone(self, pos, angle: float) -> None:
        """Drone as its 3-box composite (frame 100x10 + two 20x20 motors,
        Drone.py geometry) at a world pose."""
        cfg, s, h = self.cfg, self.surface, float(self.h)
        c, sn = np.cos(angle), np.sin(angle)
        R = np.array([[c, -sn], [sn, c]])

        def poly(local_corners):
            world = (R @ np.asarray(local_corners).T).T + np.asarray(pos)
            return [(float(x), _flip(float(y), h)) for x, y in world]

        hw, hh = cfg.drone_width / 2, cfg.drone_height / 4
        pygame.draw.polygon(
            s, FRAME_COLOR, poly([(-hw, -hh), (-hw, hh), (hw, hh), (hw, -hh)])
        )
        m = cfg.drone_height / 2
        for side in (-cfg.drone_radius, cfg.drone_radius):
            pygame.draw.polygon(
                s, MOTOR_COLOR,
                poly([(side - m, -m), (side - m, m), (side + m, m), (side + m, -m)]),
            )

    def draw_flight_path(self, path: Sequence[Tuple[float, float]], color) -> None:
        """path is already in screen coords (reference flight_path format)."""
        if len(path) > 2:
            pygame.draw.aalines(self.surface, color, False, list(path), 1)

    def draw_reward_colorbar(self) -> None:
        """The red-blue legend strip (main.py:387-397)."""
        s, w, h = self.surface, self.w, self.h
        for i in range(100):
            pygame.draw.line(
                s, red_blue_grad(i / 100),
                (w - 100, h - 900 - i), (w - 50, h - 900 - i), 1,
            )
        font = pygame.font.SysFont("Arial", 30)
        s.blit(font.render("High reward", True, (0, 0, 0)), (w - 140, h - 1030))
        s.blit(font.render("Low reward", True, (0, 0, 0)), (w - 140, h - 910))

    # -- outputs -------------------------------------------------------------

    def frame(self) -> np.ndarray:
        """Current surface as (H, W, 3) uint8 (main.py:267-270 orientation)."""
        arr = pygame.surfarray.array3d(self.surface)
        return np.flipud(np.rot90(arr))

    def save_png(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        pygame.image.save(self.surface, path)


def overlay_plot(
    cfg: EnvConfig,
    flight_paths: Sequence[Sequence[Tuple[float, float]]],
    rewards: np.ndarray,
    collisions: np.ndarray,
    out_path: str,
) -> None:
    """All-episodes flight-path overlay PNG (main.py:329-400): paths colored
    by min-max-normalized episode reward (red=low, blue=high); collision
    episodes forced red."""
    r = SceneRenderer(cfg)
    r.draw_scene()
    rewards = np.asarray(rewards, np.float64)
    lo, hi = rewards.min(), rewards.max()
    normed = np.zeros_like(rewards) if hi == lo else (rewards - lo) / (hi - lo)
    single = len(flight_paths) == 1
    for i, path in enumerate(flight_paths):
        forced_red = bool(collisions[i] == 1) or single
        color = (255, 0, 0) if forced_red else red_blue_grad(float(normed[i]))
        r.draw_flight_path(path, color)
    r.draw_reward_colorbar()
    r.save_png(out_path)


def episode_gif(
    cfg: EnvConfig,
    traj: np.ndarray,
    angles: Optional[np.ndarray],
    traj_len: int,
    out_path: str,
    *,
    fps: int = 30,
    every: int = 2,
) -> None:
    """Replay one episode's trajectory to a GIF (main.py:293-295 cadence:
    every 2nd frame at 30 fps)."""
    import imageio

    r = SceneRenderer(cfg)
    frames = []
    trail: list = []
    for t in range(0, int(traj_len), every):
        r.draw_scene()
        x, y = float(traj[t, 0]), float(traj[t, 1])
        trail.append((x, _flip(y, cfg.screensize_y)))
        if len(trail) > 2:
            r.draw_flight_path(trail, (16, 19, 97))
        r.draw_drone((x, y), float(angles[t]) if angles is not None else 0.0)
        frames.append(r.frame())
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    imageio.mimsave(out_path, frames, fps=fps)
