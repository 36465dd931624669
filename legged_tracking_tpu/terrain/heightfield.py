"""Runtime heightfield representation + batched queries.

The world is a grid of (num_rows x num_cols) sub-terrain tiles, each a
two-layer heightfield ``(2, h, w)`` — layer 0 ceiling, layer 1 floor, meters —
mirroring the reference's ``height_samples_by_row_col`` (tunnel.py:84,202-208)
and ``env_height_samples`` (legged_robot_trajectory_tracking.py:1827-1840).

TPU design: tiles are stored once (deduplicated) as ``(T, 2, h, w)``; each env
carries a tile index. Contact and height-scan queries are pure batched gathers
(bilinear for contact), replacing PhysX trimesh collision and the reference's
per-env python-loop ``stack_heights`` (legged_robot_trajectory_tracking.py:1967).
Queries clamp to the tile window exactly like ``_get_heights`` does (:1951-1952).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# A/B knob for the merged stage-2 sampling contraction (read at import).
# Default OFF: the merged single-contraction form saves one batched op per
# substep but pays the A3 concat's traffic — measured 363.8-364.0k vs the
# two-dot form's 366.97k env-steps/s at the 4096 bench (round 5).
_MERGE3 = os.environ.get("BENCH_MERGE3", "0") == "1"


class TerrainArrays(NamedTuple):
    tiles: jnp.ndarray            # (T, 2, h, w) meters; [:,0]=ceiling, [:,1]=floor
    env_tile: jnp.ndarray         # (N,) int32 tile index per env
    env_origin: jnp.ndarray       # (N, 3) robot spawn origin (world)
    env_terrain_origin: jnp.ndarray  # (N, 3) tile lower-corner origin (world)
    horizontal_scale: float       # static
    is_plane: bool                # static: plane mode (flat floor, no ceiling)
    # static: structural top of the ceiling layer.  The ceiling is a SLAB
    # occupying z in [h_ceil(x,y), ceiling_top]: bodies inside the tunnel hit
    # its lower surface, bodies above it stand on its flat top (the
    # reference's trimesh plateau border is walkable the same way).
    ceiling_top: float = 1e3


def plane_terrain(num_envs: int, env_spacing: float = 3.0, ceiling: float = 1e3) -> TerrainArrays:
    """Flat-plane world: a grid of robots, dummy 2x2 tiles (reference
    _get_env_origins else-branch, legged_robot_trajectory_tracking.py:1848-1858)."""
    num_cols = int(np.floor(np.sqrt(num_envs)))
    num_rows = int(np.ceil(num_envs / num_cols))
    xx, yy = np.meshgrid(np.arange(num_rows), np.arange(num_cols), indexing="ij")
    origins = np.zeros((num_envs, 3), dtype=np.float32)
    origins[:, 0] = env_spacing * xx.flatten()[:num_envs]
    origins[:, 1] = env_spacing * yy.flatten()[:num_envs]
    tiles = np.zeros((1, 2, 2, 2), dtype=np.float32)
    tiles[:, 0] = ceiling
    return TerrainArrays(
        tiles=jnp.asarray(tiles),
        env_tile=jnp.zeros(num_envs, dtype=jnp.int32),
        env_origin=jnp.asarray(origins),
        env_terrain_origin=jnp.asarray(origins * np.array([1.0, 1.0, 0.0], np.float32)),
        horizontal_scale=1.0,
        is_plane=True,
    )


def _gather_layers(tiles: jnp.ndarray, env_tile, xi, yi):
    """Flat-index gather of both layers at integer cell coords.

    tiles (T, 2, h, w); env_tile (...,) broadcastable against xi/yi leading
    dims; xi/yi (..., P) int32.  Returns (..., P, 2) [ceiling, floor].

    One flat gather per layer — NEVER materializes per-point tile copies (a
    naive take_along_axis broadcast is O(N*P*h*w) memory: 24 GB at 4096 envs).
    """
    T, L, h, w = tiles.shape
    flat = tiles.reshape(-1)
    base = env_tile[..., None] * (L * h * w) + xi * w + yi  # (..., P)
    ceil = jnp.take(flat, base, axis=0)
    floor = jnp.take(flat, base + h * w, axis=0)
    return jnp.stack([ceil, floor], axis=-1)


def sample_height_bilinear(terrain: TerrainArrays, env_tile, env_terrain_origin, points_xy):
    """Bilinear floor/ceiling heights + gradients at world-frame xy points.

    Args:
      env_tile: (...,) int tile index (per env, broadcast against points)
      env_terrain_origin: (..., 3)
      points_xy: (..., P, 2) world xy
    Returns:
      heights (..., P, 2) [ceiling, floor], grads (..., P, 2, 2) d h / d xy.
    """
    tiles = terrain.tiles
    h, w = tiles.shape[2], tiles.shape[3]
    hs = terrain.horizontal_scale
    local = (points_xy - env_terrain_origin[..., None, :2]) / hs
    x = jnp.clip(local[..., 0], 0.0, h - 1.001)
    y = jnp.clip(local[..., 1], 0.0, w - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    h00 = _gather_layers(tiles, env_tile, x0, y0)
    h10 = _gather_layers(tiles, env_tile, x0 + 1, y0)
    h01 = _gather_layers(tiles, env_tile, x0, y0 + 1)
    h11 = _gather_layers(tiles, env_tile, x0 + 1, y0 + 1)

    hx0 = h00 * (1 - fy) + h01 * fy
    hx1 = h10 * (1 - fy) + h11 * fy
    height = hx0 * (1 - fx) + hx1 * fx                     # (..., P, 2)
    dhdx = (hx1 - hx0) / hs
    dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / hs
    grads = jnp.stack([dhdx, dhdy], axis=-1)               # (..., P, 2, 2)
    return height, grads


PATCH = 32  # robot-local patch size (cells) for contact queries: ±0.8 m at
            # hs=0.05 — collision spheres stay within ±0.5 m of the base


def extract_patch(terrain: TerrainArrays, env_tile, env_terrain_origin, base_xy,
                  px: int = PATCH, py: int = PATCH):
    """Cut a (2, px, py) window of the env's tile around the base.

    Single-env (engine vmaps).  Returns (patch, x_start, y_start) with the
    start indices clamped so the window stays inside the tile.
    """
    tiles = terrain.tiles
    h, w = tiles.shape[2], tiles.shape[3]
    hs = terrain.horizontal_scale
    local = (base_xy - env_terrain_origin[:2]) / hs
    xs = jnp.clip(local[0].astype(jnp.int32) - px // 2, 0, max(h - px, 0))
    ys = jnp.clip(local[1].astype(jnp.int32) - py // 2, 0, max(w - py, 0))
    tile = jax.lax.dynamic_index_in_dim(tiles, env_tile, 0, keepdims=False)
    patch = jax.lax.dynamic_slice(tile, (0, xs, ys),
                                  (2, min(px, h), min(py, w)))
    if h < px or w < py:        # tiny plane tiles: pad by edge replication
        patch = jnp.pad(patch, ((0, 0), (0, px - min(px, h)),
                                (0, py - min(py, w))), mode="edge")
    # bf16 storage to match extract_patches_batched (see there)
    return patch.astype(jnp.bfloat16), xs, ys


def extract_patches_batched(terrain: TerrainArrays, env_tile, env_terrain_origin,
                            base_xy, px: int = PATCH, py: int = PATCH):
    """Batched robot-local windows for ALL envs at once.

    vmapped dynamic_slice lowers to serialized while-loops on TPU (~29 ms/step
    measured); this formulation gathers only the px needed ROWS per env from
    the flat (T*2*h, w) row table (vs. the earlier whole-tile gather: 2.5x
    less HBM traffic at the bench terrain), then cuts columns with one
    one-hot MXU contraction.  Rows/columns beyond a tiny tile clamp to the
    edge (same replication the old pad branch produced).

    base_xy (N, 2) -> (patch (N, 2, px, py), xs (N,), ys (N,)).
    """
    tiles = terrain.tiles
    h, w = tiles.shape[2], tiles.shape[3]
    hs = terrain.horizontal_scale
    local = (base_xy - env_terrain_origin[:, :2]) / hs
    xs = jnp.clip(local[:, 0].astype(jnp.int32) - px // 2, 0, max(h - px, 0))
    ys = jnp.clip(local[:, 1].astype(jnp.int32) - py // 2, 0, max(w - py, 0))
    rows = tiles.reshape(tiles.shape[0] * 2 * h, w)             # free reshape
    p_idx = jnp.clip(xs[:, None] + jnp.arange(px)[None, :], 0, h - 1)
    ridx = (env_tile[:, None, None] * (2 * h)
            + jnp.arange(2, dtype=env_tile.dtype)[None, :, None] * h
            + p_idx[:, None, :])                                # (N, 2, px)
    # bf16 row gather + patch storage: every consumer contracts the patch on
    # the MXU at bfloat16 precision (sample_patch_*), so the operand is
    # rounded to bf16 per use ANYWAY — storing it rounded once is identical
    # on TPU and halves the gather + patch HBM traffic (the extraction
    # einsum + gather measured 24 ms/iter at 4096 envs).  Height rounding is
    # <=0.4% of a cell value — the order of the reference terrain's 5 mm
    # vertical quantization.
    g = rows[ridx].astype(jnp.bfloat16)                         # (N, 2, px, w)
    q_idx = jnp.clip(ys[:, None] + jnp.arange(py)[None, :], 0, w - 1)
    Ey = (jnp.arange(w)[None, None, :]
          == q_idx[:, :, None]).astype(jnp.bfloat16)            # (N, py, w)
    with jax.default_matmul_precision("bfloat16"):
        patch = jnp.einsum("nlpw,nqw->nlpq", g, Ey,
                           preferred_element_type=jnp.float32)  # (N, 2, px, py)
    return patch.astype(jnp.bfloat16), xs, ys


def extract_patches_batched_layer(terrain: TerrainArrays, env_tile,
                                  env_terrain_origin, base_xy,
                                  px: int = PATCH, py: int = PATCH):
    """Whole-tile-layer variant of ``extract_patches_batched_granule``.

    The granule gather's residual cost is per-INDEX overhead (14.6 ms/iter
    for 40,960 indices at the 4096 bench, trace_attribution_r4_granule);
    gathering each env's two full tile layers needs only (N, 2) indices of
    perfectly contiguous (h16 * 128) bf16 rows — zero amplification, 5x
    fewer descriptors. The full-height window is free downstream (sampler
    contraction depth pads to 128 regardless of px), so ``px`` only shapes
    the y-cut. Returns (patch (N, 2, h16, py), xs=0, ys).
    """
    tiles = terrain.tiles
    T = tiles.shape[0]
    h, w = tiles.shape[2], tiles.shape[3]
    hs = terrain.horizontal_scale
    h16 = -(-h // 16) * 16
    wp = 128

    local = (base_xy - env_terrain_origin[:, :2]) / hs
    ys = jnp.clip(local[:, 1].astype(jnp.int32) - py // 2, 0, max(w - py, 0))

    tp = tiles.astype(jnp.bfloat16)
    if h16 != h:
        tp = jnp.concatenate(
            [tp, jnp.repeat(tp[:, :, -1:, :], h16 - h, axis=2)], axis=2)
    tp = jnp.pad(tp, ((0, 0), (0, 0), (0, 0), (0, wp - w)), mode="edge")
    layers = tp.reshape(T * 2, h16 * wp)

    lidx = (env_tile[:, None] * 2
            + jnp.arange(2, dtype=env_tile.dtype)[None, :])     # (N, 2)
    g = layers[lidx].reshape(base_xy.shape[0], 2, h16, wp)
    q_idx = jnp.clip(ys[:, None] + jnp.arange(py)[None, :], 0, w - 1)
    Ey = (jnp.arange(wp)[None, None, :]
          == q_idx[:, :, None]).astype(jnp.bfloat16)            # (N, py, wp)
    with jax.default_matmul_precision("bfloat16"):
        patch = jnp.einsum("nlpw,nqw->nlpq", g, Ey,
                           preferred_element_type=jnp.float32)
    return (patch.astype(jnp.bfloat16),
            jnp.zeros_like(ys), ys)


def precompute_granule_table(terrain: TerrainArrays):
    """Host-side build of the padded bf16 granule table used by
    ``extract_patches_batched_granule`` — byte-identical to its in-jit
    ``tp`` construction, hoisted out of the step (tiles are a runtime jit
    argument, so XLA cannot constant-fold the pad/concat there; measured
    ~3 ms/iter at the 4096 bench inside the gather line).  Returns
    (grans (T*2*n_gran_tile, 16, 128) bf16, n_gran_tile)."""
    tiles = np.asarray(terrain.tiles, np.float32)
    T, _, h, w = tiles.shape
    h16 = -(-h // 16) * 16
    wp = 128
    tp = np.asarray(tiles, dtype=np.float32)
    tp = jnp.asarray(tp).astype(jnp.bfloat16)
    tp = np.asarray(tp)
    if h16 != h:
        tp = np.concatenate(
            [tp, np.repeat(tp[:, :, -1:, :], h16 - h, axis=2)], axis=2)
    tp = np.pad(tp, ((0, 0), (0, 0), (0, 0), (0, wp - w)), mode="edge")
    n_gran_tile = h16 // 16
    return (jnp.asarray(tp.reshape(T * 2 * n_gran_tile, 16, wp)),
            n_gran_tile)


def extract_patches_batched_granule(terrain: TerrainArrays, env_tile,
                                    env_terrain_origin, base_xy,
                                    px: int = PATCH, py: int = PATCH,
                                    table=None):
    """Granule-aligned variant of ``extract_patches_batched``.

    The row gather above fetches 80 B rows that each straddle a 2-4 KB
    physical tile granule (~25x HBM read amplification — the 33 ms/iter item
    in docs/bench_logs/trace_attribution_r4.txt). Here the table is
    reshaped so ONE gather index fetches ONE bf16 (16, 128) granule exactly:
    tiles pad to (T, 2, h16, 128) bf16 and view as (T*2*h16/16, 16, 128);
    gathering ceil(px/16)+1 consecutive granules per env covers any px-row
    window with zero partial-granule reads. The wider rows (w -> 128) and
    extra rows are free downstream: the samplers' MXU contractions pad K to
    128 regardless.

    Same contract: (patch (N, 2, PX, py) bf16, xs (N,), ys (N,)) with
    PX = 16 * n_granules rows starting at row ``xs`` (xs is granule-aligned
    here; samplers only use xs as the patch's global row offset).
    """
    tiles = terrain.tiles
    T = tiles.shape[0]
    h, w = tiles.shape[2], tiles.shape[3]
    hs = terrain.horizontal_scale
    h16 = -(-h // 16) * 16
    wp = 128
    n_gran_tile = h16 // 16
    n_gran = min(-(-px // 16) + 1, n_gran_tile)

    local = (base_xy - env_terrain_origin[:, :2]) / hs
    xs_raw = jnp.clip(local[:, 0].astype(jnp.int32) - px // 2, 0, max(h - px, 0))
    ys = jnp.clip(local[:, 1].astype(jnp.int32) - py // 2, 0, max(w - py, 0))
    g0 = jnp.clip(xs_raw // 16, 0, n_gran_tile - n_gran)        # (N,)

    # pad rows to the granule grid, bf16 (see the rounding note in
    # extract_patches_batched), view as granules; edge rows replicate (same
    # clamp semantics as the row path).  ``table`` (precompute_granule_table)
    # supplies this HOST-precomputed — tiles are a runtime jit argument, so
    # the pad/concat here cannot constant-fold and would re-run every
    # control step (round-5 measurement: ~3 ms/iter at the 4096 bench).
    if table is not None:
        grans = table
    else:
        tp = tiles.astype(jnp.bfloat16)
        if h16 != h:
            tp = jnp.concatenate(
                [tp, jnp.repeat(tp[:, :, -1:, :], h16 - h, axis=2)], axis=2)
        tp = jnp.pad(tp, ((0, 0), (0, 0), (0, 0), (0, wp - w)), mode="edge")
        grans = tp.reshape(T * 2 * n_gran_tile, 16, wp)

    gidx = ((env_tile[:, None, None] * 2
             + jnp.arange(2, dtype=env_tile.dtype)[None, :, None]) * n_gran_tile
            + g0[:, None, None]
            + jnp.arange(n_gran, dtype=env_tile.dtype)[None, None, :])
    g = grans[gidx]                                  # (N, 2, n_gran, 16, wp)
    g = g.reshape(base_xy.shape[0], 2, n_gran * 16, wp)
    q_idx = jnp.clip(ys[:, None] + jnp.arange(py)[None, :], 0, w - 1)
    Ey = (jnp.arange(wp)[None, None, :]
          == q_idx[:, :, None]).astype(jnp.bfloat16)            # (N, py, wp)
    with jax.default_matmul_precision("bfloat16"):
        patch = jnp.einsum("nlpw,nqw->nlpq", g, Ey,
                           preferred_element_type=jnp.float32)
    return patch.astype(jnp.bfloat16), g0 * 16, ys


class GranuleSampler:
    """Precomputed layer-interleaved granule table for patch extraction.

    Round-5 restructure of ``extract_patches_batched_granule`` driven by the
    round-4 attribution (docs/bench_logs/trace_attribution_r4_granule.txt:
    extraction ≈ 46 ms of the 89 ms/iter heightfield total). Three measured
    costs, three structural fixes:

    1. The bf16 pad/concat/reshape of the tile table ran INSIDE the jitted
       step (``tiles`` is a runtime argument, so XLA cannot constant-fold
       it): the table is now built ONCE host-side at env construction.
    2. One gather index now fetches one (rpu, 2, wp) UNIT = 4096 bf16
       elements = exactly two physical (16, 128) granules, contiguous —
       half the descriptors of the per-layer granule path, zero partial
       reads, and the padded width adapts to the tile (wp = 32/64/128, so
       a 40-cell-wide tunnel tile no longer pads 3.2x to 128).
    3. The unit is LAYER-INTERLEAVED (rows x 2 layers x wp), so the y-cut
       einsum's natural output order is already the fused-sampling layout
       (N, PX, 2, py) == transpose_patch's (N, PX, 2*py) after a free
       reshape — the 11.7 ms/iter relayout disappears.

    Bitwise-equal heights vs the legacy paths for in-window points: same
    bf16 cell values, same clamp semantics (rows/cols edge-replicate), and
    the one-hot contractions accumulate the same <=2 products in f32.
    """

    def __init__(self, terrain: TerrainArrays, wp: int | None = None):
        tiles = np.asarray(terrain.tiles, np.float32)      # (T, 2, h, w)
        T, L, h, w = tiles.shape
        assert L == 2
        self.h, self.w = h, w
        # wp = 128 keeps the y-cut einsum's contraction lane-FULL (the
        # round-5 A/B: an adaptive wp=64 table halved gather bytes but
        # measured far worse — the MXU contracts K=wp on the lane axis, so
        # narrow tables waste half of every operand register). Override for
        # A/B via the wp argument.
        self.wp = 128 if wp is None else wp
        assert self.wp >= w, (self.wp, w)
        self.rpu = 2048 // self.wp                         # rows per unit
        hp = -(-h // self.rpu) * self.rpu
        self.units_per_tile = hp // self.rpu
        tp = tiles.astype(jnp.bfloat16)
        tp = np.asarray(tp)
        if hp != h:
            tp = np.concatenate(
                [tp, np.repeat(tp[:, :, -1:, :], hp - h, axis=2)], axis=2)
        if self.wp != w:
            tp = np.pad(tp, ((0, 0), (0, 0), (0, 0), (0, self.wp - w)),
                        mode="edge")
        # (T, 2, hp, wp) -> (T, units, rpu*2, wp): layer axis INSIDE the
        # unit, rows ordered (row, layer).  Stored 2-D-minor as
        # (U, rpu*2, wp): TPU tiles the last TWO dims as (16, 128), so a
        # (..., rpu, 2, wp) shape would leave only 2 valid sublanes per
        # physical tile — an 8x physically padded table whose gather reads
        # 8x the bytes (measured: 31.2 vs 14.6 ms/iter, round-5 trace).
        tp = tp.transpose(0, 2, 1, 3).reshape(
            T, self.units_per_tile, self.rpu * 2, self.wp)
        self.table = jnp.asarray(
            tp.reshape(T * self.units_per_tile, self.rpu * 2, self.wp))

    def n_units(self, px: int) -> int:
        """Units covering any px-row window at arbitrary alignment."""
        return min(-(-(px - 1) // self.rpu) + 1, self.units_per_tile)

    def extract(self, env_tile, env_terrain_origin, base_xy, px: int, py: int,
                hs: float):
        """(patch_z (N, PX, 2*py) bf16 fused layout, xs (N,), ys (N,)).

        PX = n_units(px) * rpu rows starting at global row ``xs``; column
        z = layer * py + y (the transpose_patch/sample_patch_*_fused
        contract).  ``py`` columns starting at ``ys`` with edge clamping,
        exactly like extract_patches_batched_granule.
        """
        nu = self.n_units(px)
        PX = nu * self.rpu
        local = (base_xy - env_terrain_origin[:, :2]) / hs
        xs_raw = jnp.clip(local[:, 0].astype(jnp.int32) - px // 2,
                          0, max(self.h - px, 0))
        ys = jnp.clip(local[:, 1].astype(jnp.int32) - py // 2,
                      0, max(self.w - py, 0))
        u0 = jnp.clip(xs_raw // self.rpu, 0, self.units_per_tile - nu)
        uidx = (env_tile[:, None] * self.units_per_tile + u0[:, None]
                + jnp.arange(nu, dtype=env_tile.dtype)[None, :])   # (N, nu)
        g = self.table[uidx]                       # (N, nu, rpu*2, wp)
        # rows m = (p, l) pairs — already the fused layout's row order; the
        # shape stays 2-D-minor ((2*PX, wp) tiles densely) end to end
        g = g.reshape(base_xy.shape[0], 2 * PX, self.wp)
        q_idx = jnp.clip(ys[:, None] + jnp.arange(py)[None, :], 0, self.w - 1)
        Ey = (jnp.arange(self.wp)[None, None, :]
              == q_idx[:, :, None]).astype(jnp.bfloat16)           # (N, py, wp)
        with jax.default_matmul_precision("bfloat16"):
            # natural dot_general output order [n, (p, l), q] IS the fused
            # layout — no transpose (cf. the extract_patches_batched note)
            patch = jnp.einsum("nmw,nqw->nmq", g, Ey,
                               preferred_element_type=jnp.float32)
        patch_z = patch.astype(jnp.bfloat16).reshape(
            base_xy.shape[0], PX, 2 * py)
        return patch_z, u0 * self.rpu, ys


def sample_patch_nearest(patch, xs, ys, hs, h, w, env_terrain_origin, points_xy):
    """Nearest-cell heights from a robot-local patch — single env.

    Hard-one-hot analogue of sample_patch_bilinear; semantics of
    sample_height_nearest for points inside the patch (the 21x11 scan grid
    spans ±1.17 m while the default scan patch covers ±1.6 x ±0.8 m).
    Returns (P, 2) [ceiling, floor].
    """
    px, py = patch.shape[1], patch.shape[2]
    local = (points_xy - env_terrain_origin[:2]) / hs
    x0 = jnp.clip(jnp.clip(local[:, 0].astype(jnp.int32), 0, h - 2) - xs, 0, px - 1)
    y0 = jnp.clip(jnp.clip(local[:, 1].astype(jnp.int32), 0, w - 2) - ys, 0, py - 1)
    Hx = (jnp.arange(px)[None, :] == x0[:, None]).astype(patch.dtype)  # (P, px)
    Hy = (jnp.arange(py)[None, :] == y0[:, None]).astype(patch.dtype)  # (P, py)
    with jax.default_matmul_precision("bfloat16"):  # see sample_patch_bilinear
        A = jnp.einsum("px,lxy->lpy", Hx, patch)
        return jnp.einsum("lpy,py->pl", A, Hy,
                          preferred_element_type=jnp.float32)           # (P, 2)


def sample_patch_nearest_fused(patch_z, xs, ys, hs, h, w, env_terrain_origin,
                               points_xy):
    """Nearest-cell heights from a (px, 2*py) transpose_patch window.

    Fused analogue of sample_patch_nearest: the layer axis rides the
    matmul's output columns, so the x-contraction is ONE MXU pass instead
    of a 2-batched pair.  Returns (P, 2) [ceiling, floor].
    """
    px, py2 = patch_z.shape
    py = py2 // 2
    P = points_xy.shape[0]
    local = (points_xy - env_terrain_origin[:2]) / hs
    x0 = jnp.clip(jnp.clip(local[:, 0].astype(jnp.int32), 0, h - 2) - xs, 0, px - 1)
    y0 = jnp.clip(jnp.clip(local[:, 1].astype(jnp.int32), 0, w - 2) - ys, 0, py - 1)
    Hx = (jnp.arange(px)[None, :] == x0[:, None]).astype(patch_z.dtype)  # (P, px)
    Hy = (jnp.arange(py)[None, :] == y0[:, None]).astype(patch_z.dtype)  # (P, py)
    with jax.default_matmul_precision("bfloat16"):  # see sample_patch_bilinear
        A = jnp.einsum("px,xz->pz", Hx, patch_z,
                       preferred_element_type=jnp.float32)
        A = A.astype(patch_z.dtype).reshape(P, 2, py)
        return jnp.einsum("ply,py->pl", A, Hy,
                          preferred_element_type=jnp.float32)            # (P, 2)


def sample_patch_bilinear(patch, xs, ys, hs, h, w, env_terrain_origin, points_xy):
    """Bilinear heights + gradients from a robot-local patch — single env.

    Replaces per-point scalar gathers (the dominant physics cost in device
    traces, ~29 ms/step at 4096 envs) with separable soft-one-hot
    contractions: val = Wx @ patch @ Wy^T where Wx/Wy carry the
    interpolation weights, and d/dx uses the weight derivative.

    Semantics match sample_height_bilinear for points within the patch
    (guaranteed for collision spheres); points clamp to the patch border
    beyond ±(px/2, py/2) cells of the base.
    """
    px, py = patch.shape[1], patch.shape[2]
    local = (points_xy - env_terrain_origin[:2]) / hs          # (P, 2)
    x = jnp.clip(local[:, 0], 0.0, h - 1.001) - xs
    y = jnp.clip(local[:, 1], 0.0, w - 1.001) - ys
    x = jnp.clip(x, 0.0, px - 1.001)
    y = jnp.clip(y, 0.0, py - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    colsx = jnp.arange(px)[None, :]
    colsy = jnp.arange(py)[None, :]
    at0x = (colsx == x0[:, None]).astype(jnp.float32)
    at1x = (colsx == (x0 + 1)[:, None]).astype(jnp.float32)
    at0y = (colsy == y0[:, None]).astype(jnp.float32)
    at1y = (colsy == (y0 + 1)[:, None]).astype(jnp.float32)
    # bf16 weight materialization — same rounding the bf16-precision MXU
    # applies to its operands anyway; keeps this separable comparator
    # value-aligned with sample_patch_bilinear_fused (see there)
    Wx = (at0x * (1 - fx) + at1x * fx).astype(jnp.bfloat16)     # (P, px)
    Wy = (at0y * (1 - fy) + at1y * fy).astype(jnp.bfloat16)
    dWx = ((at1x - at0x) / hs).astype(jnp.bfloat16)
    dWy = ((at1y - at0y) / hs).astype(jnp.bfloat16)

    # native 1-pass bf16 MXU for the sampling contractions: product error
    # <= 0.4% of a cell height delta (~4 mm at 1 m) — the same magnitude as
    # the reference terrain's 5 mm vertical quantization, and deterministic
    # per cell (equivalent to a minutely perturbed terrain).  The engine's
    # surrounding float32 scope would otherwise run these as multi-pass
    # emulation; these einsums dominate the rollout (CLAUDE.md perf log).
    #
    # NOTE on op count: a round-2 attempt stacked these five contractions
    # into two ("kpx,lxy->klpy" + "klpy,mpy->pklm") based on per-op trace
    # times; the MEASURED result was a 32% throughput regression (275.7k ->
    # 187.2k env-steps/s at the bench config — the stacked stage 2's pklm
    # output layout forces a relayout of the (n,2,2,P,PATCH) intermediate
    # every substep). Reverted to the separable form; commit 577bd0b holds
    # the A/B details.
    with jax.default_matmul_precision("bfloat16"):
        A = jnp.einsum("px,lxy->lpy", Wx, patch,
                       preferred_element_type=jnp.float32)      # (2, P, PATCH)
        Ax = jnp.einsum("px,lxy->lpy", dWx, patch,
                        preferred_element_type=jnp.float32)
        # bf16 intermediates: stage 2 rounds its operands to bf16 at the MXU
        # regardless, so this round-once storage is value-identical on TPU
        # and halves the largest sampling intermediate's HBM traffic
        A = A.astype(jnp.bfloat16)
        Ax = Ax.astype(jnp.bfloat16)
        height = jnp.einsum("lpy,py->pl", A, Wy,
                            preferred_element_type=jnp.float32)  # (P, 2)
        dhdx = jnp.einsum("lpy,py->pl", Ax, Wy,
                          preferred_element_type=jnp.float32)
        dhdy = jnp.einsum("lpy,py->pl", A, dWy,
                          preferred_element_type=jnp.float32)
    return height, jnp.stack([dhdx, dhdy], axis=-1)             # (P,2), (P,2,2)


def transpose_patch(patch):
    """(..., 2, px, py) -> (..., px, 2*py): the fused-sampling layout.

    Column z = l*py + y merges the layer axis into the matmul's output
    columns, so ONE (2P, px) @ (px, 2*py) MXU pass per env samples both
    layers for values AND x-derivatives (sample_patch_bilinear_fused).
    Done once per control step (the patch is substep-invariant); the
    relayout cost amortizes over ``decimation`` substeps.
    """
    l, px, py = patch.shape[-3], patch.shape[-2], patch.shape[-1]
    return jnp.swapaxes(patch, -3, -2).reshape(patch.shape[:-3] + (px, l * py))


def sample_patch_bilinear_fused(patch_z, xs, ys, hs, h, w, env_terrain_origin,
                                points_xy):
    """Bilinear heights + gradients from a (px, 2*py) transposed patch.

    Value-identical reformulation of sample_patch_bilinear with 1 MXU
    matmul + 2 batched dots per call instead of 2 batched matmuls (x2 layer
    batch = 4 MXU tile passes) + 3 batched dots:

      - rows:    [Wx; dWx] (2P, px) — value and derivative interpolation
        weights share the stage-1 contraction (2P = 96 <= 128 sublanes, so
        the concatenated pass costs exactly one tile like each original op)
      - columns: ceiling|floor side by side (2*py = 64 <= 128 lanes)

    Output layouts stay natural (rows = points, columns = (layer, y)); the
    only relayout is of the PATCH itself, done once per control step by
    transpose_patch — unlike the reverted round-2 "stacked einsum" attempt
    whose pklm intermediate relayouted every substep (CLAUDE.md perf log).

    Returns (heights (P, 2) [ceiling, floor], grads (P, 2, 2) d h / d xy),
    the exact contract of sample_patch_bilinear.
    """
    px, py2 = patch_z.shape
    py = py2 // 2
    P = points_xy.shape[0]
    local = (points_xy - env_terrain_origin[:2]) / hs          # (P, 2)
    x = jnp.clip(local[:, 0], 0.0, h - 1.001) - xs
    y = jnp.clip(local[:, 1], 0.0, w - 1.001) - ys
    x = jnp.clip(x, 0.0, px - 1.001)
    y = jnp.clip(y, 0.0, py - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    colsx = jnp.arange(px)[None, :]
    at0x = (colsx == x0[:, None]).astype(jnp.float32)
    at1x = (colsx == (x0 + 1)[:, None]).astype(jnp.float32)
    colsy = jnp.arange(py)[None, :]
    at0y = (colsy == y0[:, None]).astype(jnp.float32)
    at1y = (colsy == (y0 + 1)[:, None]).astype(jnp.float32)
    # weights materialize in bf16: the consuming einsums run under bf16
    # matmul precision, which rounds every operand to bf16 at the MXU
    # regardless — casting at build time is VALUE-IDENTICAL (f32 arithmetic
    # then one rounding, same as the MXU's) and halves the W-array traffic
    # (~23 ms/iter of one-hot construction in the round-5 trace)
    Wx = (at0x * (1 - fx) + at1x * fx).astype(jnp.bfloat16)     # (P, px)
    dWx = ((at1x - at0x) / hs).astype(jnp.bfloat16)
    Wy = (at0y * (1 - fy) + at1y * fy).astype(jnp.bfloat16)     # (P, py)
    dWy = ((at1y - at0y) / hs).astype(jnp.bfloat16)

    W2 = jnp.concatenate([Wx, dWx], axis=0)                     # (2P, px)
    with jax.default_matmul_precision("bfloat16"):  # see sample_patch_bilinear
        A2 = jnp.einsum("qx,xz->qz", W2, patch_z,
                        preferred_element_type=jnp.float32)      # (2P, 2*py)
        # round-once bf16 intermediate, as in the separable form
        A2 = A2.astype(jnp.bfloat16).reshape(2 * P, 2, py)       # (q, l, y)
        if _MERGE3:
            # ONE stage-2 contraction for value/dhdx/dhdy: rows [A2; A2[:P]]
            # against [Wy; Wy; dWy] — identical f32 products in identical
            # accumulation order as the two-dot form (bitwise equal), one
            # batched op instead of two at the cost of the A3 concat's
            # traffic (A/B knob BENCH_MERGE3)
            A3 = jnp.concatenate([A2, A2[:P]], axis=0)           # (3P, 2, py)
            W3 = jnp.concatenate([Wy, Wy, dWy], axis=0)          # (3P, py)
            out = jnp.einsum("qly,qy->ql", A3, W3,
                             preferred_element_type=jnp.float32)  # (3P, 2)
            height = out[:P]                                     # (P, 2)
            dhdx = out[P:2 * P]
            dhdy = out[2 * P:]
        else:
            Wy2 = jnp.concatenate([Wy, Wy], axis=0)              # (2P, py)
            out = jnp.einsum("qly,qy->ql", A2, Wy2,
                             preferred_element_type=jnp.float32)  # (2P, 2)
            dhdy = jnp.einsum("ply,py->pl", A2[:P], dWy,
                              preferred_element_type=jnp.float32)  # (P, 2)
            height = out[:P]
            dhdx = out[P:]
    return height, jnp.stack([dhdx, dhdy], axis=-1)             # (P,2), (P,2,2)


def sample_height_nearest(terrain: TerrainArrays, env_tile, env_terrain_origin, points_xy):
    """Nearest(floor)-cell heights — exact semantics of the reference height
    scan (``(points / horizontal_scale).long()`` truncation,
    legged_robot_trajectory_tracking.py:1948-1956).

    Returns (..., P, 2) [ceiling, floor].
    """
    tiles = terrain.tiles
    h, w = tiles.shape[2], tiles.shape[3]
    hs = terrain.horizontal_scale
    local = (points_xy - env_terrain_origin[..., None, :2]) / hs
    x0 = jnp.clip(local[..., 0].astype(jnp.int32), 0, h - 2)
    y0 = jnp.clip(local[..., 1].astype(jnp.int32), 0, w - 2)
    return _gather_layers(tiles, env_tile, x0, y0)
