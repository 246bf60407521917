"""Fused Pallas kernel for the dilated gated WaveNet stack.

reference hot loop: MBExWN_NVoc/vocoder/model/custom_AE_layers.py:273-346
(dilated conv -> gate -> res/skip 1x1 per layer).

Why a kernel: under plain XLA the bf16 stack reaches ~97 TFLOP/s (~50% of
MXU peak) because every layer round-trips x, the gated activation, the
res/skip projection and the conditioning slab through HBM with imperfect
overlap.  This kernel runs GROUPS of layers per grid step with the group's
weights resident in VMEM, the inter-layer activations never leaving VMEM,
and the skip accumulation on-chip:

  HBM traffic per group  =  read x tile (+halo) + read cond tile (+halo)
                          + write x' + write skip partial

The halo equals the group's summed dilations, so each layer's output region
shrinks by d on each side and every slice in the kernel is static -- no
masking, no dynamic shapes.  x and cond are pre-padded with the halo in HBM
(zeros == SAME-conv semantics at the utterance edges) and DMA'd manually,
because BlockSpec windows cannot overlap.

dtype policy: weights/activations bf16, every dot accumulates fp32
(preferred_element_type), the gate nonlinearity evaluates on the fp32
accumulator, res/skip adds in fp32, outputs cast back to bf16 -- at least
as accurate as the XLA bf16 path.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_kernel(dils: Tuple[int, ...], Tt: int, C: int, halo: int, T_real: int,
                  x_hbm, cond_hbm, skip_in_ref, wd_ref, bd_ref, wr_ref, br_ref,
                  xout_ref, skipout_ref, xh, ch, sem_x, sem_c):
    b = pl.program_id(0)
    i = pl.program_id(1)
    W0 = Tt + 2 * halo

    # manual halo DMA: x/cond are pre-padded by `halo` in HBM, so the
    # [i*Tt, i*Tt + W0) window is always in bounds
    dma_x = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * Tt, W0), :], xh, sem_x)
    dma_c = pltpu.make_async_copy(cond_hbm.at[b, pl.ds(i * Tt, W0), :], ch, sem_c)
    dma_x.start()
    dma_c.start()
    dma_x.wait()
    dma_c.wait()

    # x rides HBM with its lane dim padded to a 128 multiple (DMA slices must
    # be tile-aligned); drop the pad lanes here
    x_cur = xh[:, :C]
    skip_acc = skip_in_ref[0].astype(jnp.float32)
    # absolute offset of x_cur's first row (grows by d per layer)
    pos = 0
    W = W0
    for l, d in enumerate(dils):
        Wn = W - 2 * d
        wd = wd_ref[l]  # (3, C, 2C)
        y = jax.lax.dot_general(
            x_cur[d : d + Wn], wd[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y += jax.lax.dot_general(
            x_cur[0:Wn], wd[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y += jax.lax.dot_general(
            x_cur[2 * d : 2 * d + Wn], wd[2], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pos += d
        y += bd_ref[l].astype(jnp.float32)
        # cond rides HBM with its lane dim padded to a 128 multiple like x;
        # drop the pad lanes here
        y += ch[pos : pos + Wn, : 2 * C].astype(jnp.float32)
        gated = (jnp.tanh(y[:, :C]) * jax.nn.sigmoid(y[:, C:])).astype(x_cur.dtype)
        rs = jax.lax.dot_general(
            gated, wr_ref[l], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + br_ref[l].astype(jnp.float32)
        x_cur = (x_cur[d : d + Wn].astype(jnp.float32) + rs[:, :C]).astype(x_cur.dtype)
        # SAME-conv semantics: every layer's input is ZERO outside the real
        # [0, T) range (the XLA path zero-pads per layer); halo positions
        # beyond the utterance edge would otherwise carry gate(bias) values
        rows = jax.lax.broadcasted_iota(jnp.int32, (Wn, 1), 0) + (i * Tt - halo + pos)
        x_cur = jnp.where((rows >= 0) & (rows < T_real), x_cur, jnp.zeros_like(x_cur))
        # skip contribution cropped to the final Tt window (starts at
        # absolute position `halo`)
        crop = halo - pos
        skip_acc += rs[crop : crop + Tt, C:]
        W = Wn

    # halo is rounded up to the sublane tile for DMA alignment, so a surplus
    # of (halo - sum(dils)) columns remains on each side
    extra = halo - int(np.sum(dils))
    xout_ref[0] = x_cur[extra : extra + Tt]
    skipout_ref[0] = skip_acc.astype(xout_ref.dtype)


def fused_wavenet_group(x, cond, w_dil, b_dil, w_rs, b_rs, dils: Sequence[int],
                        skip_in=None, tile_t: int = 0, interpret: bool = False):
    """Run `len(dils)` gated residual layers fused.

    x:      (B, T, C)   activations (bf16 recommended)
    cond:   (B, T, 2C)  conditioning slab (shared-upsampled path)
    w_dil:  (L, 3, C, 2C), b_dil: (L, 2C)
    w_rs:   (L, C, 2C),    b_rs:  (L, 2C)
            (a final skip-only layer is padded to 2C with zero res columns)
    skip_in:(B, T, C) running skip accumulator or None
    Returns (x_out, skip_out), both (B, T, C).
    """
    B, T, C = x.shape
    L = len(dils)
    # DMA slices must be aligned to the sublane tile (16 rows for bf16)
    halo = -(-int(np.sum(dils)) // 16) * 16
    if tile_t <= 0:
        # tile dividing T; ~800 rows balances VMEM (weights + double-buffered
        # tiles + fp32 gate accumulator) against halo recompute overhead
        tile_t = T
        for cand in (800, 640, 512, 400, 320, 256, 160, 128):
            if T % cand == 0 and cand <= T:
                tile_t = cand
                break
    assert T % tile_t == 0, (T, tile_t)
    nT = T // tile_t
    W0 = tile_t + 2 * halo

    C_pad = -(-C // 128) * 128
    C2_pad = -(-(2 * C) // 128) * 128  # cond DMA needs the same lane alignment
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, C_pad - C)))
    cp = jnp.pad(cond, ((0, 0), (halo, halo), (0, C2_pad - 2 * C)))
    if skip_in is None:
        skip_in = jnp.zeros_like(x)

    kernel = functools.partial(_group_kernel, tuple(int(d) for d in dils), tile_t, C, halo, T)
    grid = (B, nT)
    in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # x padded, manual DMA
            pl.BlockSpec(memory_space=pl.ANY),  # cond padded, manual DMA
            pl.BlockSpec((1, tile_t, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_dil resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, tile_t, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_t, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
    ]
    flops = 2 * B * T * L * (3 * C * 2 * C + C * 2 * C)
    x_out, skip_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((W0, C_pad), x.dtype),
            pltpu.VMEM((W0, C2_pad), cond.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.nbytes * 3 + cond.nbytes,
            transcendentals=2 * B * T * L * C,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the resident weight stack + double-buffered tiles exceed the
            # default 16M scoped-vmem budget; v5e has 128M physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, cp, skip_in, w_dil, b_dil, w_rs, b_rs)
    return x_out, skip_out


def fused_wavenet_stack(x, cond, layer_weights, dils: Sequence[int], group_size: int = 4,
                        interpret: bool = False, tile_t: int = 0):
    """Full stack: split `dils` into groups of `group_size` fused calls.

    layer_weights: list of (w_dil (3,C,2C), b_dil (2C), w_rs (C,Cout), b_rs (Cout))
    per layer; the last layer may be skip-only (Cout == C) and is zero-padded
    into the uniform (C, 2C) form.  Returns the summed skip (B, T, C).

    Tuning knobs (benchmark experiments; defaults are the measured-best b1
    serving configuration): MBEXWN_PALLAS_GROUP overrides group_size — fewer
    layers per group shrinks the halo-recompute overhead of high-dilation
    groups at the cost of one extra x/skip HBM round trip per split;
    MBEXWN_PALLAS_TILE overrides the time-tile row count (must divide the
    stack's T or it falls back to auto) — larger tiles amortize the halo.
    """
    import os

    env_group = os.environ.get("MBEXWN_PALLAS_GROUP", "").strip()
    if env_group.isdigit() and int(env_group) > 0:
        group_size = int(env_group)
    env_tile = os.environ.get("MBEXWN_PALLAS_TILE", "").strip()
    if env_tile.isdigit() and int(env_tile) > 0:
        t = int(env_tile)
        if x.shape[1] % t == 0:
            tile_t = t

    B, T, C = x.shape
    L = len(dils)
    skip = None
    for g0 in range(0, L, group_size):
        gl = list(range(g0, min(g0 + group_size, L)))
        wd = jnp.stack([layer_weights[l][0] for l in gl])
        bd = jnp.stack([layer_weights[l][1] for l in gl])
        wr_list, br_list = [], []
        for l in gl:
            wr, br = layer_weights[l][2], layer_weights[l][3]
            if wr.shape[-1] == C:  # final skip-only layer: zero res columns
                wr = jnp.concatenate([jnp.zeros_like(wr), wr], axis=-1)
                br = jnp.concatenate([jnp.zeros_like(br), br], axis=-1)
            wr_list.append(wr)
            br_list.append(br)
        x, skip = fused_wavenet_group(
            x, cond, wd, bd, jnp.stack(wr_list), jnp.stack(br_list),
            [dils[l] for l in gl], skip_in=skip, interpret=interpret, tile_t=tile_t,
        )
    return skip
