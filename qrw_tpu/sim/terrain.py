"""Terrain height fields: flat / procedural bumpy / stairs environment.

In-graph replacement for the reference's PyBullet world construction
(scripts/PyBulletSimulator.py:36-175): the ground becomes a height
function h(x, y) sampled by the contact model, so terrains vmap over
scenarios and live on-device.

  * `make_bumpy` reproduces the reference's procedural heightfield
    exactly: python `random.seed(41)`, uniform perturbations up to
    0.05 m on a 512x512 grid at 0.05 m mesh scale, with the duplicated
    2x2 cell pattern and (height+prev)/2 smoothing of
    scripts/PyBulletSimulator.py:42-66.
  * `make_stairs` approximates the envID=1 obstacle course
    (scripts/PyBulletSimulator.py:73-142): a parametric staircase stands
    in for the external bauzil_stairs.urdf, plus the red (1.0 x 0.1 x
    0.02 m) and green (0.2 x 0.1 x 0.01 m) perturbation steps at the
    reference's positions.

Heights are bilinearly interpolated; the contact normal is kept vertical
(valid for the shallow slopes of these terrains).
"""

from __future__ import annotations

import random
from functools import lru_cache
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class Terrain(NamedTuple):
    heights: jnp.ndarray   # (H, W) height samples [m]
    cell: jnp.ndarray      # () grid spacing [m]
    origin: jnp.ndarray    # (2,) world xy of heights[0, 0]


class FleetTerrain(NamedTuple):
    """Per-scenario terrain for a heterogeneous fleet: scenario b runs
    on `terrains[tid[b] - 1]` (tid 0 = flat plane). Lookup evaluates
    each member terrain once for the whole batch and selects by id —
    lane-friendly (no per-scenario grid gathers beyond the member
    terrains' own bilinear fetches)."""
    tid: jnp.ndarray       # (B,) int32: 0 flat, i >= 1 -> terrains[i-1]
    terrains: tuple        # static tuple of Terrain


def height_at(terrain, xy):
    """Bilinear ground height at world xy (..., 2); 0 when terrain is
    None. For FleetTerrain, xy's second-to-last axis... any shape whose
    LAST batch axis is B (e.g. (4, B, 2)) broadcasts against tid (B,)."""
    if terrain is None:
        return jnp.zeros(xy.shape[:-1], xy.dtype)
    if isinstance(terrain, FleetTerrain):
        h = jnp.zeros(xy.shape[:-1], xy.dtype)
        for i, t in enumerate(terrain.terrains):
            h = jnp.where(terrain.tid == i + 1, height_at(t, xy), h)
        return h
    hmap = terrain.heights
    H, W = hmap.shape
    g = (xy - terrain.origin) / terrain.cell
    gi = jnp.clip(g[..., 1], 0.0, H - 1.001)   # row <- y
    gj = jnp.clip(g[..., 0], 0.0, W - 1.001)   # col <- x
    i0 = jnp.floor(gi).astype(jnp.int32)
    j0 = jnp.floor(gj).astype(jnp.int32)
    fi = gi - i0
    fj = gj - j0
    h00 = hmap[i0, j0]
    h01 = hmap[i0, j0 + 1]
    h10 = hmap[i0 + 1, j0]
    h11 = hmap[i0 + 1, j0 + 1]
    return ((1 - fi) * ((1 - fj) * h00 + fj * h01)
            + fi * ((1 - fj) * h10 + fj * h11))


@lru_cache(maxsize=2)
def _bumpy_np(rows: int, amplitude: float) -> np.ndarray:
    rnd = random.Random(41)                      # reference seed (:43)
    data = np.zeros((rows, rows))
    height_prev = 0.0
    for j in range(rows // 2):
        for i in range(rows // 2):
            height = rnd.uniform(0, amplitude)
            data[2 * j, 2 * i] = (height + height_prev) * 0.5
            data[2 * j, 2 * i + 1] = height
            data[2 * j + 1, 2 * i] = (height + height_prev) * 0.5
            data[2 * j + 1, 2 * i + 1] = height
            height_prev = height
    return data


def make_bumpy(rows: int = 512, cell: float = 0.05,
               amplitude: float = 0.05, dtype=jnp.float32) -> Terrain:
    """The use_flat_plane=False procedural terrain
    (scripts/PyBulletSimulator.py:42-66). Centered on the origin; heights
    shifted so the robot's start cell is at z ~ 0 (PyBullet re-settles the
    robot onto the terrain at startup, :222-265)."""
    data = _bumpy_np(rows, amplitude).copy()
    half = rows * cell / 2.0
    # shift so the ground under the origin is ~0
    c = rows // 2
    data -= data[c - 2:c + 3, c - 2:c + 3].mean()
    return Terrain(heights=jnp.asarray(data, dtype),
                   cell=jnp.asarray(cell, dtype),
                   origin=jnp.asarray([-half, -half], dtype))


def _add_box(data, cell, half, cx, cy, sx, sy, h):
    """Raise a rectangular patch (world center cx, cy; full sizes sx, sy)."""
    rows = data.shape[0]
    i0 = max(0, int((cy - sy / 2 + half) / cell))
    i1 = min(rows, int((cy + sy / 2 + half) / cell) + 1)
    j0 = max(0, int((cx - sx / 2 + half) / cell))
    j1 = min(rows, int((cx + sx / 2 + half) / cell) + 1)
    data[i0:i1, j0:j1] = np.maximum(data[i0:i1, j0:j1], h)


def _bauzil_heights():
    """True Bauzil staircase geometry: the reference's bauzil_stairs.stl
    (652 triangles), with the URDF transform applied (scale 0.7/1.0/0.5,
    yaw -0.75, translation (-1.2, -1.5, -0.01) —
    scripts/bauzil_stairs.urdf), rasterized once into a 2 cm max-z
    heightfield and vendored as a 2 KB npz asset. Returns
    (heights (H, W) f32, cell, origin (2,))."""
    import os
    path = os.path.join(os.path.dirname(__file__), "bauzil_stairs_hf.npz")
    with np.load(path) as f:
        return (np.asarray(f["heights"], np.float32), float(f["cell"]),
                np.asarray(f["origin"], np.float32))


def make_stairs(rows: int = 512, cell: float = 0.02,
                dtype=jnp.float32) -> Terrain:
    """envID=1 obstacle course (scripts/PyBulletSimulator.py:73-142):
    the true bauzil_stairs.urdf staircase geometry (vendored rasterized
    heightfield, see _bauzil_heights) plus the red (1.0 x 0.1 x 0.02 m)
    and green (0.2 x 0.1 x 0.01 m) perturbation steps at the reference's
    positions."""
    data = np.zeros((rows, rows))
    half = rows * cell / 2.0
    # bauzil staircase mesh, resampled onto this grid by nearest cell
    bh, bcell, borig = _bauzil_heights()
    H, W = bh.shape
    ys = (np.arange(rows) * cell - half - borig[1]) / bcell   # grid rows
    xs = (np.arange(rows) * cell - half - borig[0]) / bcell
    iy = np.clip(np.round(ys).astype(int), 0, H - 1)
    ix = np.clip(np.round(xs).astype(int), 0, W - 1)
    inside = ((ys >= 0) & (ys <= H - 1))[:, None] \
        & ((xs >= 0) & (xs <= W - 1))[None, :]
    data = np.where(inside, bh[iy][:, ix], 0.0)
    # red steps: 1.0 x 0.1 x 0.02 m at y = 0.5 + 0.2 i (:81-101)
    for i in range(4):
        _add_box(data, cell, half, 0.0, 0.5 + 0.2 * i, 1.0, 0.1, 0.02)
    _add_box(data, cell, half, 0.5, 0.5 + 0.2 * 4, 1.0, 0.1, 0.02)
    _add_box(data, cell, half, 0.5, 0.5 + 0.2 * 5, 1.0, 0.1, 0.02)
    # green steps: 0.2 x 0.1 x 0.01 m at x = +-0.15, y = 0.9 + 0.2 i (:124-133)
    for i in range(3):
        _add_box(data, cell, half, 0.15 * (-1) ** i, 0.9 + 0.2 * i,
                 0.2, 0.1, 0.01)
    return Terrain(heights=jnp.asarray(data, dtype),
                   cell=jnp.asarray(cell, dtype),
                   origin=jnp.asarray([-half, -half], dtype))


def make_terrain(cfg, dtype=jnp.float32) -> Optional[Terrain]:
    """Terrain from config flags (use_flat_plane, envID) like the
    reference constructor (scripts/PyBulletSimulator.py:30-41)."""
    if cfg.envID == 1:
        return make_stairs(dtype=dtype)
    if not cfg.use_flat_plane:
        return make_bumpy(dtype=dtype)
    return None
