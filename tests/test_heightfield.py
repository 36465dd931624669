"""Height-query equivalence: patch-based fast paths vs flat reference paths.

The patch samplers exist purely for TPU performance (see
docs/ARCHITECTURE.md); they must return the SAME values as the flat-gather
formulations for all points within the patch margin.
"""

import jax
import jax.numpy as jnp
import numpy as np

from legged_tracking_tpu.config import Cfg, config_go1
from legged_tracking_tpu.terrain.heightfield import (
    PATCH, extract_patch, extract_patches_batched, sample_height_bilinear,
    sample_height_nearest, sample_patch_bilinear, sample_patch_nearest)
from legged_tracking_tpu.terrain.tunnel import build_terrain


def make_terrain(n=8):
    cfg = config_go1(Cfg())
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.terrain_type = "single_path"
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.terrain_length = 4.0
    cfg.terrain.terrain_width = 2.0
    cfg.terrain.terrain_ratio_x = 0.9
    cfg.terrain.terrain_ratio_y = 0.5
    cfg.terrain.ceiling_height = 0.8
    cfg.terrain.start_loc = 0.32
    return build_terrain(cfg, n, seed=5)


def test_patch_extraction_batched_matches_single():
    t = make_terrain()
    base = np.asarray(t.env_origin)[:, :2] + np.array([0.3, -0.1])
    pb, xsb, ysb = extract_patches_batched(t, t.env_tile, t.env_terrain_origin,
                                           jnp.asarray(base))
    for i in range(4):
        p, xs, ys = extract_patch(t, t.env_tile[i], t.env_terrain_origin[i],
                                  jnp.asarray(base[i]))
        assert int(xs) == int(xsb[i]) and int(ys) == int(ysb[i])
        np.testing.assert_allclose(np.asarray(p), np.asarray(pb[i]))


def _bf16_quantized(t):
    """The patch path stores heights in bf16 (exactly what the TPU MXU's
    bfloat16 contractions round them to per use); the flat reference must
    sample the same quantized terrain for an apples-to-apples comparison."""
    return t._replace(tiles=t.tiles.astype(jnp.bfloat16).astype(jnp.float32))


def test_patch_bilinear_matches_flat():
    t = make_terrain()
    rng = np.random.RandomState(0)
    base = np.asarray(t.env_origin)[:, :2]
    # points within ±0.5 m of each base (collision-sphere envelope)
    pts = base[:, None, :] + rng.uniform(-0.5, 0.5, (8, 16, 2))
    pts = jnp.asarray(pts)
    tq = _bf16_quantized(t)
    h_flat, g_flat = sample_height_bilinear(tq, t.env_tile, t.env_terrain_origin, pts)
    pb, xs, ys = extract_patches_batched(t, t.env_tile, t.env_terrain_origin,
                                         jnp.asarray(base))
    th, tw = t.tiles.shape[2], t.tiles.shape[3]
    h_patch, g_patch = jax.vmap(
        sample_patch_bilinear, in_axes=(0, 0, 0, None, None, None, 0, 0))(
        pb, xs, ys, t.horizontal_scale, th, tw, t.env_terrain_origin, pts)
    # residual tolerance = the bf16 rounding of the A2 intermediate (the
    # only arithmetic difference vs full f32 on the quantized terrain)
    np.testing.assert_allclose(np.asarray(h_patch), np.asarray(h_flat), atol=6e-3)
    np.testing.assert_allclose(np.asarray(g_patch), np.asarray(g_flat), atol=5e-2)


def test_patch_nearest_matches_flat():
    t = make_terrain()
    rng = np.random.RandomState(1)
    base = np.asarray(t.env_origin)[:, :2]
    pts = base[:, None, :] + rng.uniform(-0.7, 0.7, (8, 24, 2))
    pts = jnp.asarray(pts)
    h_flat = sample_height_nearest(_bf16_quantized(t), t.env_tile,
                                   t.env_terrain_origin, pts)
    pb, xs, ys = extract_patches_batched(t, t.env_tile, t.env_terrain_origin,
                                         jnp.asarray(base), 64, 32)
    th, tw = t.tiles.shape[2], t.tiles.shape[3]
    h_patch = jax.vmap(
        sample_patch_nearest, in_axes=(0, 0, 0, None, None, None, 0, 0))(
        pb, xs, ys, t.horizontal_scale, th, tw, t.env_terrain_origin, pts)
    np.testing.assert_allclose(np.asarray(h_patch), np.asarray(h_flat), atol=1e-6)


def test_patch_bilinear_fused_matches_separable():
    """The fused single-matmul sampler (transpose_patch layout) must return
    the separable sampler's values: same products, same contraction lengths,
    same bf16 round-once points — only the op packing differs."""
    from legged_tracking_tpu.terrain.heightfield import (
        sample_patch_bilinear_fused, transpose_patch)

    t = make_terrain()
    rng = np.random.RandomState(2)
    base = np.asarray(t.env_origin)[:, :2]
    pts = base[:, None, :] + rng.uniform(-0.5, 0.5, (8, 16, 2))
    pts = jnp.asarray(pts)
    pb, xs, ys = extract_patches_batched(t, t.env_tile, t.env_terrain_origin,
                                         jnp.asarray(base))
    th, tw = t.tiles.shape[2], t.tiles.shape[3]
    h_sep, g_sep = jax.vmap(
        sample_patch_bilinear, in_axes=(0, 0, 0, None, None, None, 0, 0))(
        pb, xs, ys, t.horizontal_scale, th, tw, t.env_terrain_origin, pts)
    h_fus, g_fus = jax.vmap(
        sample_patch_bilinear_fused, in_axes=(0, 0, 0, None, None, None, 0, 0))(
        transpose_patch(pb), xs, ys, t.horizontal_scale, th, tw,
        t.env_terrain_origin, pts)
    np.testing.assert_allclose(np.asarray(h_fus), np.asarray(h_sep),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_sep),
                               rtol=0, atol=1e-4)


def test_patch_nearest_fused_matches_separable():
    from legged_tracking_tpu.terrain.heightfield import (
        sample_patch_nearest_fused, transpose_patch)

    t = make_terrain()
    rng = np.random.RandomState(3)
    base = np.asarray(t.env_origin)[:, :2]
    pts = base[:, None, :] + rng.uniform(-0.7, 0.7, (8, 24, 2))
    pts = jnp.asarray(pts)
    pb, xs, ys = extract_patches_batched(t, t.env_tile, t.env_terrain_origin,
                                         jnp.asarray(base), 64, 32)
    th, tw = t.tiles.shape[2], t.tiles.shape[3]
    h_sep = jax.vmap(
        sample_patch_nearest, in_axes=(0, 0, 0, None, None, None, 0, 0))(
        pb, xs, ys, t.horizontal_scale, th, tw, t.env_terrain_origin, pts)
    h_fus = jax.vmap(
        sample_patch_nearest_fused, in_axes=(0, 0, 0, None, None, None, 0, 0))(
        transpose_patch(pb), xs, ys, t.horizontal_scale, th, tw,
        t.env_terrain_origin, pts)
    np.testing.assert_allclose(np.asarray(h_fus), np.asarray(h_sep),
                               rtol=0, atol=1e-6)


def test_patch_narrow_y_matches_full():
    """SimCfg.patch_y narrows the contact window along world y. For points
    inside the narrow window (the Go1 sphere envelope stays within ±0.5 m of
    the base; py=24 covers ±0.6 m) the narrow patch must reproduce the
    full-width patch's heights and gradients exactly — only points beyond
    the window edge clamp differently."""
    t = make_terrain()
    rng = np.random.RandomState(3)
    base = np.asarray(t.env_origin)[:, :2]
    pts = base[:, None, :] + np.stack([rng.uniform(-0.5, 0.5, (8, 16)),
                                       rng.uniform(-0.45, 0.45, (8, 16))], -1)
    pts = jnp.asarray(pts)
    th, tw = t.tiles.shape[2], t.tiles.shape[3]
    out = {}
    for py in (32, 24):
        pb, xs, ys = extract_patches_batched(
            t, t.env_tile, t.env_terrain_origin, jnp.asarray(base), PATCH, py)
        out[py] = jax.vmap(
            sample_patch_bilinear, in_axes=(0, 0, 0, None, None, None, 0, 0))(
            pb, xs, ys, t.horizontal_scale, th, tw, t.env_terrain_origin, pts)
    np.testing.assert_allclose(np.asarray(out[24][0]), np.asarray(out[32][0]),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[24][1]), np.asarray(out[32][1]),
                               rtol=0, atol=1e-6)


def test_patch_narrow_x_matches_full():
    """SimCfg.patch_x narrows the contact window along world x (the fused
    sampler's stage-1 MXU contraction depth). For points inside the window
    the narrow patch must reproduce the full-length patch exactly — same
    envelope argument as patch_y."""
    t = make_terrain()
    rng = np.random.RandomState(5)
    base = np.asarray(t.env_origin)[:, :2]
    pts = base[:, None, :] + np.stack([rng.uniform(-0.35, 0.35, (8, 16)),
                                       rng.uniform(-0.35, 0.35, (8, 16))], -1)
    pts = jnp.asarray(pts)
    th, tw = t.tiles.shape[2], t.tiles.shape[3]
    out = {}
    for px in (32, 16):
        pb, xs, ys = extract_patches_batched(
            t, t.env_tile, t.env_terrain_origin, jnp.asarray(base), px, 16)
        out[px] = jax.vmap(
            sample_patch_bilinear, in_axes=(0, 0, 0, None, None, None, 0, 0))(
            pb, xs, ys, t.horizontal_scale, th, tw, t.env_terrain_origin, pts)
    np.testing.assert_allclose(np.asarray(out[16][0]), np.asarray(out[32][0]),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[16][1]), np.asarray(out[32][1]),
                               rtol=0, atol=1e-6)


def test_pallas_scan_matches_patch_nearest():
    """Pallas fused scan kernel (interpret mode on CPU) == the patch-based
    nearest path for grid points around each base, including off-tile points
    (both clamp to the tile edge)."""
    from legged_tracking_tpu.terrain.heightfield import (
        sample_patch_nearest_fused, transpose_patch)
    from legged_tracking_tpu.terrain.pallas_scan import scan_heights_pallas

    t = make_terrain()
    rng = np.random.RandomState(7)
    N = 8
    base = np.asarray(t.env_origin)[:, :2] + rng.uniform(-0.2, 0.2, (N, 2))
    gx, gy = np.meshgrid(np.linspace(-1, 1, 21), np.linspace(-0.5, 0.5, 11),
                         indexing="ij")
    grid = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)  # (P,2)
    pts = jnp.asarray(base[:, None, :] + grid[None])                  # (N,P,2)

    th, tw = t.tiles.shape[2], t.tiles.shape[3]
    pb, xs, ys = extract_patches_batched(
        t, t.env_tile, t.env_terrain_origin, jnp.asarray(base), 64, 40)
    ref = jax.vmap(sample_patch_nearest_fused,
                   in_axes=(0, 0, 0, None, None, None, 0, 0))(
        transpose_patch(pb), xs, ys, t.horizontal_scale, th, tw,
        t.env_terrain_origin, pts)                                    # (N,P,2)
    ref = jnp.moveaxis(ref, -1, 1)                                    # (N,2,P)

    def frames_for(b):
        return jnp.stack([b, jnp.zeros_like(b), t.env_terrain_origin[:, :2]],
                         axis=1)

    out = scan_heights_pallas(t.tiles, t.env_tile, frames_for(jnp.asarray(base)),
                              jnp.asarray(grid), t.horizontal_scale,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)

    # off-tile robustness: a base far beyond the tile clamps to the edge
    far = jnp.asarray(base) + jnp.asarray([10.0, 10.0])
    out_far = scan_heights_pallas(
        t.tiles, t.env_tile, frames_for(far),
        jnp.asarray(grid), t.horizontal_scale, interpret=True)
    edge = t.tiles.astype(jnp.bfloat16).astype(jnp.float32)[
        t.env_tile][:, :, -2, -2]                                     # (N,2)
    np.testing.assert_allclose(np.asarray(out_far),
                               np.broadcast_to(np.asarray(edge)[:, :, None],
                                               out_far.shape), atol=1e-6)


def test_granule_extraction_matches_rows():
    """Granule-aligned gather == row gather through the bilinear sampler for
    all in-envelope points (the granule window is a superset, so sampled
    values must be identical)."""
    from legged_tracking_tpu.terrain.heightfield import (
        extract_patches_batched_granule)

    t = make_terrain()
    rng = np.random.RandomState(11)
    base = np.asarray(t.env_origin)[:, :2] + rng.uniform(-0.2, 0.2, (8, 2))
    pts = base[:, None, :] + rng.uniform(-0.45, 0.45, (8, 16, 2))
    pts = jnp.asarray(pts)
    th, tw = t.tiles.shape[2], t.tiles.shape[3]
    outs = {}
    for name, fn in [("rows", extract_patches_batched),
                     ("gran", extract_patches_batched_granule)]:
        pb, xs, ys = fn(t, t.env_tile, t.env_terrain_origin,
                        jnp.asarray(base), 24, 16)
        outs[name] = jax.vmap(
            sample_patch_bilinear, in_axes=(0, 0, 0, None, None, None, 0, 0))(
            pb, xs, ys, t.horizontal_scale, th, tw, t.env_terrain_origin, pts)
    for a, b in zip(outs["rows"], outs["gran"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_layer_extraction_matches_rows():
    """Whole-tile-layer gather == row gather through the bilinear sampler for
    in-envelope points (full-height window is a superset)."""
    from legged_tracking_tpu.terrain.heightfield import (
        extract_patches_batched_layer)

    t = make_terrain()
    rng = np.random.RandomState(13)
    base = np.asarray(t.env_origin)[:, :2] + rng.uniform(-0.2, 0.2, (8, 2))
    pts = base[:, None, :] + rng.uniform(-0.45, 0.45, (8, 16, 2))
    pts = jnp.asarray(pts)
    th, tw = t.tiles.shape[2], t.tiles.shape[3]
    outs = {}
    for name, fn in [("rows", extract_patches_batched),
                     ("layer", extract_patches_batched_layer)]:
        pb, xs, ys = fn(t, t.env_tile, t.env_terrain_origin,
                        jnp.asarray(base), 24, 16)
        outs[name] = jax.vmap(
            sample_patch_bilinear, in_axes=(0, 0, 0, None, None, None, 0, 0))(
            pb, xs, ys, t.horizontal_scale, th, tw, t.env_terrain_origin, pts)
    for a, b in zip(outs["rows"], outs["layer"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_granule_extraction_velocity_terrain_shape():
    """Granule gather handles non-80x40 tile shapes (velocity terrain is
    (T, 2, 160, 72): h%16==0 but w needs the 128-pad) — sampled values
    match the row path."""
    from legged_tracking_tpu.config import Cfg, config_go1
    from legged_tracking_tpu.terrain.heightfield import (
        extract_patches_batched_granule)
    from legged_tracking_tpu.terrain.legged_gym_terrains import (
        build_velocity_terrain)

    cfg = config_go1(Cfg())
    cfg.terrain.mesh_type = "trimesh"
    t = build_velocity_terrain(cfg.terrain, 8, 3)
    rng = np.random.RandomState(17)
    base = np.asarray(t.env_origin)[:, :2] + rng.uniform(-0.3, 0.3, (8, 2))
    pts = base[:, None, :] + rng.uniform(-0.45, 0.45, (8, 16, 2))
    pts = jnp.asarray(pts)
    th, tw = t.tiles.shape[2], t.tiles.shape[3]
    outs = {}
    for name, fn in [("rows", extract_patches_batched),
                     ("gran", extract_patches_batched_granule)]:
        pb, xs, ys = fn(t, t.env_tile, t.env_terrain_origin,
                        jnp.asarray(base), 24, 16)
        outs[name] = jax.vmap(
            sample_patch_bilinear, in_axes=(0, 0, 0, None, None, None, 0, 0))(
            pb, xs, ys, t.horizontal_scale, th, tw, t.env_terrain_origin, pts)
    for a, b in zip(outs["rows"], outs["gran"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)
