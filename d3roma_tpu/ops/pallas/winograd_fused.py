"""Fused Winograd F(2x2,3x3) conv kernel (Mosaic/Pallas TPU).

The pure-XLA Winograd (ops/winograd.py) materializes the transformed
tiles V and products M in HBM — 4x the input size each, written+read —
so it is HBM-bound and only marginally beats the direct int8 conv
emitter. This kernel keeps V and M in VMEM: HBM traffic drops to the
tap-split input read + output write (~3x less), and the 2.25x MXU FLOP
reduction of F(2x2,3x3) becomes the binding term. bf16 GEMMs at the
2.25x reduction give an EFFECTIVE conv ceiling of 2.25 x 197 = 443
TFLOP/s — above the int8 direct-conv peak, with bf16 accuracy.

Mosaic constraints shaped the layout (same findings as conv2d_halo.py):

- No in-kernel stride-2 or offset-1 sublane slices: the 4 COLUMN taps
  (j = col offsets 0..3 of each tile, stride 2) are pre-split on the
  host into 4 arrays xj[B, Rp, Twp, Cp] — in-kernel access is plain
  block indexing. The split is one fused XLA pass (2x input bytes).
- ROW taps index dim 1 of the 4D tap arrays — an untiled dim, so the
  2*tr+i offsets are unconstrained. Row windows overlap (halo 2), so
  tap arrays stay in HBM (memory_space ANY) and each grid step DMAs
  its [2*TR+2, Twp, Cp] window explicitly (proven pattern).
- Channel dims lane-padded on the host (320->384); all lane slices are
  at Cp/o_block multiples.
- The output interleaves even/odd columns in the LANE dim
  ([..., Twp, 2*o_blk]: v*o_blk + o) — a stride-2 sublane write would
  be misaligned; the host un-interleaves with one reshape pass.

The 16 tap GEMMs run per grid step as [TR*Twp, Cp] x [Cp, o_blk] bf16
contractions with f32 accumulation; B^T/A^T transforms are pure
adds/subs on values (exact in f32).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBL = 8  # bf16 sublane tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# G (4x3) for the weight transform; B^T/A^T are applied as adds in-kernel
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)


def _block_budget(x_shape, block_tr: int, o_block: int) -> int:
    """Peak VMEM bytes of one grid step.

    The pipelined blocks (the u weight block and the output block) are
    DOUBLE-buffered by Mosaic across grid steps — counted twice. This is
    AOT-probe-validated across every model conv site
    (_scratch/wino_sites_aot.py): with single-counted u, the C=1280
    sites (u = 5 MB) estimated 12.0 MB and failed Mosaic VMEM
    allocation; every site this model admits compiles."""
    _, _, W, C = x_shape
    cp = _round_up(C, _LANES)
    twp = _round_up((W + 1) // 2, _SUBL)
    tr = block_tr
    taps = 4 * (2 * tr + 2) * twp * cp * 2          # DMA'd input windows
    u = 16 * cp * o_block * 2 * 2                   # weights (dbl-buffered)
    v16 = 16 * tr * twp * cp * 2                    # ALL taps' V rows live
    m = 16 * tr * twp * o_block * 4                 # f32 tap products
    y = 2 * tr * twp * 2 * o_block * 4 * 2          # out blk (dbl-buffered)
    return taps + u + v16 + m + y


# AOT-probe measured: every admitted (site, tr, o_block) compiles and the
# rejected ones fail Mosaic VMEM allocation; 13 MB leaves margin for the
# transform temps that ride on top of this estimate.
_VMEM_CAP = 13 * 1024 * 1024


def pick_block_tr(x_shape, o_block: int = 128):
    """Largest block_tr within the VMEM budget whose row-padding waste is
    within 10% of the best achievable (bigger blocks -> bigger GEMM M;
    tiny waste savings don't justify halving it). None if nothing fits OR
    the per-block GEMM M (= tr * twp) would starve the MXU — tiny tile
    grids (the UNet's 12x20 / 6x10 bottom levels) are better served by
    the XLA Winograd, which folds the batch into the GEMM M dim (and
    whose small slabs don't hit the HBM-inflation cap there)."""
    th = (x_shape[1] + 1) // 2
    twp = _round_up((x_shape[2] + 1) // 2, _SUBL)
    # tr * twp >= 96: enough GEMM M rows per block to feed the MXU.
    # waste <= 25%: a tile-row grid that tr can't divide without heavy
    # padding (th=6 at the 12x20 level: 8/6 = 33%) wastes MXU work the
    # XLA formulation doesn't (it folds batch into M instead).
    # tr=2 is NOT a candidate: the per-block DMA source row offset is
    # r*2*tr, and HBM DMA row offsets must be bf16-sublane-tile (8)
    # aligned — 2*2=4 compiles but FAULTS on device (observed: the
    # (16,90,160,512) VAE decoder site took the whole wino_static
    # pipeline down with "TPU device error"); 2*4 and 2*8 are aligned.
    fitting = [tr for tr in (8, 4)
               if _block_budget(x_shape, tr, o_block) <= _VMEM_CAP
               and tr * twp >= 96
               and _round_up(th, tr) / th <= 1.25]
    if not fitting:
        return None
    best_ratio = min(_round_up(th, tr) / th for tr in fitting)
    for tr in fitting:  # descending size
        if _round_up(th, tr) / th <= best_ratio * 1.10:
            return tr
    return fitting[-1]


def pick_config(x_shape):
    """(block_tr, o_block) for the fused kernel, or None.

    o_block is always 128: Mosaic requires the u weight block's last dim
    to be a full lane tile (o_block=64 fails lowering — AOT-probed), and
    shrinking it would not rescue the wide-C sites anyway: at C=1280 the
    fused kernel re-streams the 5 MB u block for every (batch, row-block)
    grid step (~2.5 GB/call vs the XLA formulation's single 52 MB weight
    read), so those sites are weight-bound and belong on the XLA
    Winograd, which they fall back to when this returns None."""
    tr = pick_block_tr(x_shape, 128)
    return None if tr is None else (tr, 128)


def wino_fused_supported(x_shape, w_shape, strides, padding) -> bool:
    """Stride-1 SAME 3x3, NHWC, with the per-block working set in VMEM
    (at the kernel's only legal o_block, 128 — see pick_config)."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    if tuple(w_shape[:2]) != (3, 3) or tuple(strides) != (1, 1):
        return False
    if isinstance(padding, str):
        if padding.upper() != "SAME":
            return False
    elif tuple(map(tuple, padding)) != ((1, 1), (1, 1)):
        return False
    return pick_config(x_shape) is not None


def _kernel(xj_hbm0, xj_hbm1, xj_hbm2, xj_hbm3, u_ref, o_ref, bufs, v_ref,
            sems, *, block_tr, twp, cp, o_blk, out_dtype):
    """One grid step: DMA 4 tap windows, 16 transform+GEMMs, A^T, write.

    The o-block grid dim iterates innermost over the SAME input window:
    the tap DMAs and the B^T transforms run only at o==0 and the
    transformed tiles V persist in scratch across the o steps (TPU grid
    steps are sequential; scratch persists) — at the 320->320 latent
    site this saves 2/3 of both the DMA traffic and the VPU transform
    work."""
    TR = block_tr
    b = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(pl.program_id(2) == 0)
    def _load_and_transform():
        xj = (xj_hbm0, xj_hbm1, xj_hbm2, xj_hbm3)
        copies = []
        for j in range(4):
            c = pltpu.make_async_copy(
                xj[j].at[b, pl.ds(r * 2 * TR, 2 * TR + 2)],
                bufs.at[j], sems.at[j],
            )
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()

        def bt(a):  # B^T combination (adds only)
            return [a[0] - a[2], a[1] + a[2], a[2] - a[1], a[1] - a[3]]

        # per tile-row: rows d[i][j] = bufs[j, 2*tr+i] (row dim untiled),
        # row-combine over i, column-combine over j -> 16 V rows per tr
        for tr in range(TR):
            d = [[bufs[j, 2 * tr + i].astype(jnp.float32) for j in range(4)]
                 for i in range(4)]
            e = [bt([d[i][j] for i in range(4)]) for j in range(4)]  # e[j][x]
            for x in range(4):
                col = bt([e[j][x] for j in range(4)])                # col[y]
                for y in range(4):
                    v_ref[x * 4 + y, pl.ds(tr * twp, twp)] = (
                        col[y].astype(jnp.bfloat16))

    m_taps = []
    for t in range(16):
        m = jax.lax.dot_general(
            v_ref[t], u_ref[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_taps.append(m.reshape(TR, twp, o_blk))

    def at(a):  # A^T combination (adds only)
        return [a[0] + a[1] + a[2], a[1] - a[2] - a[3]]

    # Y[u][v] = A^T M A ; lanes pack (v, o)
    f = [[at([m_taps[x * 4 + y] for x in range(4)])[u] for y in range(4)]
         for u in range(2)]                                  # f[u][y]
    for u in range(2):
        yv = at([f[u][y] for y in range(4)])                 # yv[v][TR,twp,o]
        row = jnp.concatenate(yv, axis=-1)                   # [TR,twp,2o]
        # output rows 2*tr + u for tr in 0..TR-1: write per tile-row
        # (rows are the block's untiled dim -> arbitrary static offsets)
        for tr in range(TR):
            o_ref[0, 2 * tr + u] = row[tr].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_tr", "o_block", "interpret"),
)
def conv3x3_wino_fused(x, w, block_tr: int = 8, o_block: int = 128,
                       interpret: bool = False):
    """[B,H,W,C] x [3,3,C,O] stride-1 SAME conv via fused Winograd.

    Output dtype follows jnp.promote_types(x, w) (flax Conv convention).
    """
    B, H, W, C = x.shape
    O = w.shape[3]
    out_dtype = jnp.promote_types(x.dtype, w.dtype)

    TR = block_tr
    th = _round_up((H + 1) // 2, TR)
    twp = _round_up((W + 1) // 2, _SUBL)
    cp = _round_up(C, _LANES)
    op = _round_up(O, o_block)

    # SAME halo + grid padding, lane-pad channels
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (1, 2 * th + 1 - H), (1, 2 * twp + 1 - W),
                  (0, cp - C)))
    # 4 column taps (j = 0..3, stride 2): one fused slice/pad pass
    xj = [xp[:, :, j:j + 2 * twp - 1:2, :] for j in range(4)]

    # U = G g G^T, lane-padded, [16, cp, op] bf16 (hoisted out of scans)
    u_t = jnp.einsum("xi,ijco,yj->xyco", _G, w.astype(jnp.float32), _G)
    u_t = jnp.pad(u_t, ((0, 0), (0, 0), (0, cp - C), (0, op - O)))
    u_t = u_t.reshape(16, cp, op).astype(jnp.bfloat16)

    grid = (B, th // TR, op // o_block)
    out = pl.pallas_call(
        functools.partial(_kernel, block_tr=TR, twp=twp, cp=cp,
                          o_blk=o_block, out_dtype=out_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + [
            pl.BlockSpec((16, cp, o_block), lambda b, r, o: (0, 0, o)),
        ],
        out_specs=pl.BlockSpec((1, 2 * TR, twp, 2 * o_block),
                               lambda b, r, o: (b, r, 0, o)),
        out_shape=jax.ShapeDtypeStruct((B, 2 * th, twp, 2 * op), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((4, 2 * TR + 2, twp, cp), jnp.bfloat16),
            pltpu.VMEM((16, TR * twp, cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(xj[0], xj[1], xj[2], xj[3], u_t)

    # un-interleave the (v, o) lane packing -> W. Lanes are o-BLOCK-major
    # ([opb, v, o_block]), so: [B,Hb,twp, opb,2,o_block] -> v before opb
    # -> [B, Hb, 2*twp, op]
    opb = op // o_block
    y = out.reshape(B, 2 * th, twp, opb, 2, o_block)
    y = jnp.moveaxis(y, 4, 3).reshape(B, 2 * th, 2 * twp, op)
    return y[:, :H, :W, :O]
