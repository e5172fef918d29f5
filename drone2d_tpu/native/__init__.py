"""ctypes binding of the native float64 core (native/drone2d_core.cpp).

Auto-builds `libdrone2d_core.so` with g++ on first use (cached next to the
source); see the .cpp header for what this library is for.  Raises
NativeUnavailable when no C++ toolchain exists so callers (tests, replay)
can gracefully skip.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_SRC_DIR, "libdrone2d_core.so"))

_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    src = os.path.join(_SRC_DIR, "drone2d_core.cpp")
    if not os.path.exists(src):
        raise NativeUnavailable(f"native source missing: {src}")
    # build to a per-process temp path and os.replace into place: on a fresh
    # clone all pytest-xdist workers build concurrently, and writing the
    # final path directly would let one worker dlopen a half-written .so
    # (an interrupted build would also leave a fresh-mtime corrupt file that
    # is never rebuilt)
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", "-o", tmp, src],
            check=True, capture_output=True, text=True,
        )
        os.replace(tmp, _LIB_PATH)
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeUnavailable(f"g++ build failed: {detail}") from e
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_SRC_DIR, "drone2d_core.cpp")
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        _build()
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # stale/corrupt artifact (e.g. from an old interrupted build):
        # rebuild once, then let a persistent failure surface as skippable
        _build()
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            raise NativeUnavailable(f"cannot dlopen {_LIB_PATH}: {e}") from e

    D = ctypes.c_double
    P = ctypes.POINTER(D)
    V = ctypes.c_void_p
    I = ctypes.c_int

    lib.d2t_step_body.argtypes = [P, D, D, D, D, D, D, D]
    lib.d2t_rollout.argtypes = [P, P, I, D, D, D, D, D, P]
    lib.d2t_thrust.restype = D
    lib.d2t_thrust.argtypes = [D, D]
    lib.d2t_path_new.restype = V
    lib.d2t_path_new.argtypes = [P, I]
    lib.d2t_path_free.argtypes = [V]
    lib.d2t_path_length.restype = D
    lib.d2t_path_length.argtypes = [V]
    lib.d2t_path_point.argtypes = [V, D, P]
    lib.d2t_path_gradient.argtypes = [V, D, P]
    lib.d2t_path_direction_angle.restype = D
    lib.d2t_path_direction_angle.argtypes = [V, D]
    lib.d2t_path_closest_u.restype = D
    lib.d2t_path_closest_u.argtypes = [V, D, D, I, D, I]
    lib.d2t_path_closest_position.argtypes = [V, D, D, I, D, I, P]
    lib.d2t_path_lookahead.argtypes = [V, D, D, P]
    _lib = lib
    return lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeBody:
    """Float64 composite-drone stepper (d2t_step_body / d2t_rollout)."""

    def __init__(self, *, dt: float, gravity_y: float, mass: float,
                 inertia: float, arm: float):
        self._lib = _load()
        self.dt, self.gravity_y = dt, gravity_y
        self.mass, self.inertia, self.arm = mass, inertia, arm

    def step(self, state6: np.ndarray, left: float, right: float) -> np.ndarray:
        s = np.ascontiguousarray(state6, np.float64).copy()
        self._lib.d2t_step_body(_dptr(s), left, right, self.dt, self.gravity_y,
                                self.mass, self.inertia, self.arm)
        return s

    def rollout(self, state6: np.ndarray, forces: np.ndarray) -> np.ndarray:
        """forces: (T, 2) rotor forces.  Returns the (T, 6) trajectory."""
        s = np.ascontiguousarray(state6, np.float64).copy()
        forces = np.ascontiguousarray(forces, np.float64)
        T = len(forces)
        traj = np.empty((T, 6), np.float64)
        self._lib.d2t_rollout(_dptr(s), _dptr(forces), T, self.dt,
                              self.gravity_y, self.mass, self.inertia,
                              self.arm, _dptr(traj))
        return traj


class NativePath:
    """Float64 QPMI2D path (d2t_path_*)."""

    def __init__(self, wps: np.ndarray):
        self._lib = _load()
        wps = np.ascontiguousarray(np.asarray(wps, np.float64))
        # validate before the FFI call: d2t_path_new reads 2*n doubles from
        # the buffer, so a flat or (n,3) array would silently misparse
        if wps.ndim != 2 or wps.shape[1] != 2 or len(wps) < 3:
            raise ValueError(f"waypoints must be shaped (n>=3, 2); got {wps.shape}")
        self._handle = self._lib.d2t_path_new(_dptr(wps), len(wps))
        if not self._handle:
            raise ValueError("need at least 3 waypoints")

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.d2t_path_free(self._handle)
            self._handle = None

    @property
    def length(self) -> float:
        return self._lib.d2t_path_length(self._handle)

    def point(self, u: float) -> np.ndarray:
        out = np.empty(2, np.float64)
        self._lib.d2t_path_point(self._handle, u, _dptr(out))
        return out

    def gradient(self, u: float) -> np.ndarray:
        out = np.empty(2, np.float64)
        self._lib.d2t_path_gradient(self._handle, u, _dptr(out))
        return out

    def direction_angle(self, u: float) -> float:
        return self._lib.d2t_path_direction_angle(self._handle, u)

    def closest_u(self, pos, *, table_n: int = 2048, margin: float = 10.0,
                  golden_iters: int = 64) -> float:
        return self._lib.d2t_path_closest_u(
            self._handle, float(pos[0]), float(pos[1]), table_n, margin,
            golden_iters,
        )

    def closest_position(self, pos, *, table_n: int = 2048,
                         margin: float = 10.0, golden_iters: int = 64) -> np.ndarray:
        out = np.empty(2, np.float64)
        self._lib.d2t_path_closest_position(
            self._handle, float(pos[0]), float(pos[1]), table_n, margin,
            golden_iters, _dptr(out),
        )
        return out

    def lookahead(self, u: float, dist: float) -> np.ndarray:
        out = np.empty(2, np.float64)
        self._lib.d2t_path_lookahead(self._handle, u, dist, _dptr(out))
        return out


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False
