"""Pallas TPU kernel: fused terrain height scan straight from the tile table.

The XLA path pays three times for the 21x11 observation scan (trace
attribution docs/bench_logs/trace_attribution_r4.txt, 264 ms/iter total):
the (N, 2, 64, 40) row-gather materializing a per-env patch (~22 ms/iter —
each gathered 80 B row straddles a 2 KB T(8,128) tile, a ~25x read
amplification), the patch relayout, and the nearest-sample one-hot
contractions (~23 ms/iter). The root cause is that XLA can only express the
per-env window as a gather over HBM.

This kernel removes the patch entirely: the tile table lives in HBM, each
grid program double-buffers per-env (2, h, w) tiles into VMEM with plain
contiguous DMA (the whole table is ~400 KB — one tile is 12.8 KB), and
nearest sampling is two per-layer one-hot MXU dots from VMEM. No gather
ever touches HBM.

Semantics match ``sample_patch_nearest`` for every point (the kernel indexes
the FULL tile, so even the patch-edge clamp cases agree with the underlying
``sample_height_nearest``): x0 = clip(int(x), 0, h-2), y0 = clip(int(y),
0, w-2), out[l] = tile[l, x0, y0].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# envs per grid program; each env is one tile DMA + 2 MXU dots, so a modest
# block keeps the double buffer small while amortizing program overhead
_BLOCK = 8


def _scan_kernel(tile_ids_ref,       # SMEM (N,) int32 — scalar prefetch
                 frames_ref,         # VMEM (B, 3, 2) f32: base / cam / origin
                 grid_ref,           # VMEM (P, 2) f32: shared local scan grid
                 tiles_ref,          # HBM  (T, 2, h, w) bf16
                 out_ref,            # VMEM (B, 2, P) f32
                 tile_buf,           # VMEM (2, 2, h, w) bf16 scratch
                 sems,               # DMA semaphores (2,)
                 *, h, w, hp, wp, hs):
    i = pl.program_id(0)
    B = out_ref.shape[0]
    P = grid_ref.shape[0]

    def start_dma(e, slot):
        t = tile_ids_ref[i * B + e]
        return pltpu.make_async_copy(tiles_ref.at[t], tile_buf.at[slot],
                                     sems.at[slot])

    start_dma(0, 0).start()

    def body(e, carry):
        slot = jax.lax.rem(e, 2)

        @pl.when(e + 1 < B)
        def _():
            start_dma(e + 1, 1 - slot).start()

        # wait for this env's tile
        t = tile_ids_ref[i * B + e]
        pltpu.make_async_copy(tiles_ref.at[t], tile_buf.at[slot],
                              sems.at[slot]).wait()

        # EXACT f32 op order of the XLA path (legged_env._get_heights):
        # ((grid + base) + cam - origin) / hs — association and the true
        # division both matter; a reassociated form flips boundary cells
        px = (grid_ref[:, 0] + frames_ref[e, 0, 0]) + frames_ref[e, 1, 0]
        py = (grid_ref[:, 1] + frames_ref[e, 0, 1]) + frames_ref[e, 1, 1]
        lx = (px - frames_ref[e, 2, 0]) / hs              # (P,)
        ly = (py - frames_ref[e, 2, 1]) / hs
        # int32 cast truncates toward zero exactly like the XLA path; the
        # clip makes negatives land on cell 0 either way
        x0 = jnp.clip(lx.astype(jnp.int32), 0, h - 2)
        y0 = jnp.clip(ly.astype(jnp.int32), 0, w - 2)
        # one-hots span the PADDED dims (hp, wp) to match the buffer; the
        # clip above keeps every hit inside the real (h, w) region
        Hx = (jax.lax.broadcasted_iota(jnp.int32, (P, hp), 1)
              == x0[:, None]).astype(jnp.bfloat16)        # (P, hp)
        Hy = (jax.lax.broadcasted_iota(jnp.int32, (P, wp), 1)
              == y0[:, None]).astype(jnp.float32)         # (P, wp)
        a_ceil = jnp.dot(Hx, tile_buf[slot, 0],
                         preferred_element_type=jnp.float32)   # (P, w)
        a_floor = jnp.dot(Hx, tile_buf[slot, 1],
                          preferred_element_type=jnp.float32)
        out_ref[e, 0, :] = jnp.sum(a_ceil * Hy, axis=-1)
        out_ref[e, 1, :] = jnp.sum(a_floor * Hy, axis=-1)
        return carry

    jax.lax.fori_loop(0, B, body, 0)


@functools.partial(jax.jit, static_argnames=("hs", "interpret"))
def scan_heights_pallas(tiles, env_tile, frames, grid_pts, hs: float,
                        interpret: bool = False):
    """Nearest-cell two-layer heights for all envs' scan grids.

    tiles (T, 2, h, w) float/bf16; env_tile (N,) int32; frames (N, 3, 2) f32
    stacking [world base_xy, camera shift, env terrain origin] per env;
    grid_pts (P, 2) f32 base-local scan grid. Returns (N, 2, P) f32
    [ceiling, floor].
    """
    T, L, h, w = tiles.shape
    N = env_tile.shape[0]
    P = grid_pts.shape[0]
    B = min(_BLOCK, N)
    n_pad = -N % B
    if n_pad:
        env_tile = jnp.concatenate([env_tile, jnp.zeros(n_pad, env_tile.dtype)])
        frames = jnp.concatenate([frames, jnp.zeros((n_pad, 3, 2), frames.dtype)])
    npad = N + n_pad
    # Mosaic DMA slices need the minor dim 128-aligned and the sublane dim
    # aligned to the bf16 tile (16); pad the (constant) table once — XLA
    # constant-folds this at compile time
    wp = -(-w // 128) * 128
    hp = -(-h // 16) * 16
    if (wp, hp) != (w, h):
        tiles = jnp.pad(tiles, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    out = pl.pallas_call(
        functools.partial(_scan_kernel, h=h, w=w, hp=hp, wp=wp, hs=hs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(npad // B,),
            in_specs=[
                pl.BlockSpec((B, 3, 2), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 2), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),      # tiles stay off-chip
            ],
            out_specs=pl.BlockSpec((B, 2, P), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 2, hp, wp), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((npad, 2, P), jnp.float32),
        interpret=interpret,
    )(env_tile.astype(jnp.int32), frames.astype(jnp.float32),
      grid_pts.astype(jnp.float32), tiles.astype(jnp.bfloat16))
    return out[:N]
