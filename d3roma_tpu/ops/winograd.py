"""Winograd F(2x2, 3x3) convolution for TPU (pure XLA formulation).

Why: the direct-form ceiling is proven — no conv-as-GEMM kernel (Pallas
or XLA) beats XLA's conv emitter at the flagship shapes
(docs/PERFORMANCE.md round-3). Winograd sidesteps that proof
ALGORITHMICALLY: F(2x2,3x3) computes each 2x2 output tile with 16 MACs
instead of 36 (2.25x fewer MXU FLOPs), so even a memory-bound batched
GEMM can beat the emitter's effective rate. The reference (CUDA/torch)
gets Winograd implicitly from cuDNN; XLA:TPU has no Winograd lowering,
so this is the TPU-native equivalent.

Formulation (Lavin & Gray, arXiv:1509.09308):
    Y = A^T [ (G g G^T) .* (B^T d B) ] A      per 4x4 input tile d
- B^T entries are {0,+-1} and A^T entries are {0,+-1}: the input/output
  transforms are pure adds/subs, done here in f32 (exact).
- G has {1, +-0.5, 0}: the weight transform is exact in f32 and is
  loop-invariant — XLA hoists it out of the sampling scan.
- The 16 per-tap contractions run as ONE batched GEMM
  [16, B*Th*Tw, C] x [16, C, O] in bf16 with f32 accumulation, which is
  where the 2.25x FLOP reduction lands on the MXU.

Numerics: transforms exact in f32; the only loss vs a direct bf16 conv
is bf16 rounding of V/U GEMM inputs (the tile transform grows the
dynamic range by <= 4x, i.e. ~2 bits). Parity-tested against
`lax.conv_general_dilated` (tests/test_winograd.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from d3roma_tpu.ops.quant import is_nhwc_dn

__all__ = [
    "winograd_conv3x3",
    "winograd_supported",
    "wino_conv_general_dilated",
    "wino_static_conv_general_dilated",
]

# A^T (2x4), B^T (4x4), G (4x3) — F(2x2, 3x3)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)


def winograd_supported(lhs_shape, rhs_shape, window_strides, padding) -> bool:
    """stride-1 SAME 3x3 (the UNet/VAE resnet conv shape)."""
    if tuple(window_strides) != (1, 1):
        return False
    if rhs_shape[:2] != (3, 3):
        return False
    if isinstance(padding, str):
        return padding.upper() == "SAME"
    return tuple(map(tuple, padding)) == ((1, 1), (1, 1))


def winograd_conv3x3(x: jnp.ndarray, w: jnp.ndarray,
                     gemm_dtype=jnp.bfloat16) -> jnp.ndarray:
    """NHWC x HWIO stride-1 SAME 3x3 conv via Winograd F(2x2,3x3).

    Returns the same dtype as `jnp.promote_types(x, w)` (matching
    `lax.conv_general_dilated`'s flax usage).
    """
    B, H, W, C = x.shape
    O = w.shape[-1]
    out_dtype = jnp.promote_types(x.dtype, w.dtype)
    Th, Tw = (H + 1) // 2, (W + 1) // 2

    # SAME halo of 1 + tail padding to the tile grid
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 2 * Th + 1 - H), (1, 2 * Tw + 1 - W), (0, 0)))

    # d[i][j] [B,Th,Tw,C]: tap (i,j) of every tile (strided slices, no gather)
    d = [[xp[:, i:i + 2 * Th - 1:2, j:j + 2 * Tw - 1:2, :] for j in range(4)]
         for i in range(4)]

    # V = B^T d B — adds/subs only (B^T rows: x0=d0-d2, x1=d1+d2,
    # x2=d2-d1, x3=d1-d3), applied along rows then columns
    def bt_apply(a):
        return [a[0] - a[2], a[1] + a[2], a[2] - a[1], a[1] - a[3]]

    cols = [bt_apply([d[i][j] for i in range(4)]) for j in range(4)]
    V = [bt_apply([cols[j][x] for j in range(4)]) for x in range(4)]

    # U = G g G^T [4,4,C,O] — f32 exact, loop-invariant (hoisted by XLA)
    U = jnp.einsum("xi,ijco,yj->xyco", _G, w.astype(jnp.float32), _G)

    # batched GEMM over the 16 taps: [16, B*Th*Tw, C] x [16, C, O]
    Vs = jnp.stack([V[i][j] for i in range(4) for j in range(4)])
    Vs = Vs.reshape(16, B * Th * Tw, C).astype(gemm_dtype)
    Us = U.reshape(16, C, O).astype(gemm_dtype)
    M = lax.dot_general(
        Vs, Us, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(4, 4, B, Th, Tw, O)

    # Y = A^T M A — adds/subs only (A^T rows: u0=m0+m1+m2, u1=m1-m2-m3)
    def at_apply(a):
        return [a[0] + a[1] + a[2], a[1] - a[2] - a[3]]

    f = at_apply([M[i] for i in range(4)])               # [2][4,...]
    Y = [at_apply([f[u][y] for y in range(4)]) for u in range(2)]
    # Y[u][v] [B,Th,Tw,O] -> [B, Th,2, Tw,2, O] -> [B, 2Th, 2Tw, O]
    y = jnp.stack([jnp.stack(Y[u], axis=3) for u in range(2)], axis=2)
    y = y.reshape(B, 2 * Th, 2 * Tw, O)
    return y[:, :H, :W, :].astype(out_dtype)


# Winograd inflates HBM liveness: the XLA formulation round-trips the
# transformed tiles V (16 taps x (H/2)(W/2) x lane-padded Cin, bf16) and
# the products M (same tile grid x lane-padded Cout, f32) through HBM —
# ~(8*cp + 16*op) bytes per input pixel, i.e. ~12x the input slab when
# cp == op. At the VAE's full-resolution slabs that blows past the 16 GB
# chip (measured: wino on every VAE-decode conv compiles to 31.7 GB of
# HBM). Convs whose estimated V+M liveness exceeds the cap either stay
# on the direct conv — which XLA already runs near its int8 roofline at
# exactly those shapes (161-224 TFLOP/s, docs/PERFORMANCE.md) — or,
# with D3ROMA_WINO_CHUNK=1, run Winograd in a serialized `lax.map` over
# batch chunks so only one chunk's inflated temporaries are live at a
# time (per-image tile grids at full res are still huge GEMM M dims:
# 180x320 = 57.6k rows per frame). 3072 MB == the former 256 MB
# input-slab cap at cp == op, so the admitted cp==op sites are
# unchanged; Cout-expanding convs (whose M the old input-side proxy
# ignored) are now measured correctly.
_WINO_LIVENESS_CAP_MB = 3072


def _wino_eligible(lhs, rhs, window_strides, padding, lhs_dilation,
                   rhs_dilation, dimension_numbers, feature_group_count,
                   batch_group_count):
    """Batch-chunk size to run Winograd with, or None if ineligible.

    Returns B (no chunking) when the estimated V+M liveness fits the
    cap (D3ROMA_WINO_SLAB_MB, in MB of inflated liveness); a smaller
    divisor of B when chunking is enabled and a chunk fits; None
    otherwise (caller falls back to the direct conv)."""
    import os

    if not (
        feature_group_count == 1
        and batch_group_count == 1
        and is_nhwc_dn(dimension_numbers)
        and lhs_dilation in (None, (1, 1))
        and rhs_dilation in (None, (1, 1))
        and winograd_supported(lhs.shape, rhs.shape, window_strides, padding)
    ):
        return None
    B, H, W, C = lhs.shape
    cp = -(-C // 128) * 128
    op = -(-rhs.shape[3] // 128) * 128
    cap = float(os.environ.get("D3ROMA_WINO_SLAB_MB",
                               _WINO_LIVENESS_CAP_MB))

    def fits(bc):
        # V (16 taps, bf16) + M (16 taps, f32) over the (H/2)(W/2) tile
        # grid: 16*(HW/4)*(2*cp + 4*op) = HW*(8*cp + 16*op) bytes/item
        return bc * H * W * (8 * cp + 16 * op) / 2**20 <= cap

    if fits(B):
        return B
    if os.environ.get("D3ROMA_WINO_CHUNK", "0") != "1":
        return None
    for bc in range(B - 1, 0, -1):
        if B % bc == 0 and fits(bc):
            return bc
    return None


def _wino_dispatch_single(lhs, rhs):
    import os

    import jax

    from d3roma_tpu.ops.quant import act_ctx_mode

    fused_env = os.environ.get("D3ROMA_WINO_FUSED", "1")
    # "force" routes the fused kernel regardless of the default backend —
    # for chipless AOT compile-checks where the default backend is cpu
    # but the lowering target is the TPU topology. The calibration
    # CAPTURE forward stays Mosaic-free (same policy as the attention
    # kernels — giant Mosaic capture programs outlived the compile
    # relay's connection): the XLA formulation below is the same math.
    if act_ctx_mode() != "capture" and (
            fused_env == "force"
            or (jax.default_backend() == "tpu" and fused_env == "1")):
        from d3roma_tpu.ops.pallas.winograd_fused import (
            conv3x3_wino_fused,
            pick_config,
        )

        cfg = pick_config(lhs.shape)
        if cfg is not None:
            # fused kernel: V/M stay in VMEM (the XLA formulation below
            # is HBM-bound on their round trips)
            return conv3x3_wino_fused(lhs, rhs, block_tr=cfg[0],
                                      o_block=cfg[1])
    return winograd_conv3x3(lhs, rhs)


def _wino_dispatch(lhs, rhs, bc):
    B = lhs.shape[0]
    if bc == B:
        return _wino_dispatch_single(lhs, rhs)
    xs = lhs.reshape(B // bc, bc, *lhs.shape[1:])
    ys = lax.map(lambda xc: _wino_dispatch_single(xc, rhs), xs)
    return ys.reshape(B, *ys.shape[2:])


def _wino_or_fallback(fallback, lhs, rhs, window_strides, padding,
                      lhs_dilation, rhs_dilation, dimension_numbers,
                      feature_group_count, batch_group_count, precision,
                      preferred_element_type, require_fused=False):
    bc = _wino_eligible(lhs, rhs, window_strides, padding, lhs_dilation,
                        rhs_dilation, dimension_numbers, feature_group_count,
                        batch_group_count)
    if bc is not None and require_fused:
        # wino_static policy: Winograd ONLY where the fused kernel fits —
        # the XLA formulation's V/M HBM round trips measured 6.09 fps
        # end-to-end vs static int8's 15.37 (docs/PERFORMANCE.md), so the
        # non-fused shapes (C>=960 concat widths, big slabs) are better
        # on the static path. Shape math only: the decision is identical
        # across capture/replay and across backends.
        from d3roma_tpu.ops.pallas.winograd_fused import pick_config

        if pick_config((bc,) + tuple(lhs.shape[1:])) is None:
            bc = None
    if bc is not None:
        return _wino_dispatch(lhs, rhs, bc)
    return fallback(
        lhs, rhs, window_strides, padding, lhs_dilation, rhs_dilation,
        dimension_numbers, feature_group_count, batch_group_count,
        precision=precision, preferred_element_type=preferred_element_type,
    )


def wino_conv_general_dilated(lhs, rhs, window_strides, padding,
                              lhs_dilation=None, rhs_dilation=None,
                              dimension_numbers=None, feature_group_count=1,
                              batch_group_count=1, precision=None,
                              preferred_element_type=None):
    """Drop-in `lax.conv_general_dilated` for flax Conv: stride-1 SAME 3x3
    NHWC convs within the liveness cap go through Winograd F(2x2,3x3);
    everything else falls back to the exact XLA conv (the 'wino' mode)."""
    return _wino_or_fallback(
        lax.conv_general_dilated, lhs, rhs, window_strides, padding,
        lhs_dilation, rhs_dilation, dimension_numbers, feature_group_count,
        batch_group_count, precision, preferred_element_type)


def wino_static_conv_general_dilated(lhs, rhs, window_strides, padding,
                                     lhs_dilation=None, rhs_dilation=None,
                                     dimension_numbers=None,
                                     feature_group_count=1,
                                     batch_group_count=1, precision=None,
                                     preferred_element_type=None):
    """The 'wino_static' conv: Winograd where the FUSED kernel fits
    (pick_config admits the chunked shape), the static-int8 XLA conv for
    everything else (big slabs, strides, C>=960 concat widths) — the
    measured-best direct path at those shapes; the XLA Winograd fallback
    measured 6.09 fps end-to-end vs static's 15.37 and is never routed
    here. Routing is shape-deterministic, so the calibration capture and
    replay passes traverse the same static-int8 call sequence — PROVIDED
    calibration runs at the deployment batch size and D3ROMA_WINO_* env
    settings (eligibility depends on both; a mismatch shifts which convs
    consume scales, and replay raises)."""
    from d3roma_tpu.ops.quant import int8_conv_general_dilated_static

    return _wino_or_fallback(
        int8_conv_general_dilated_static, lhs, rhs, window_strides, padding,
        lhs_dilation, rhs_dilation, dimension_numbers, feature_group_count,
        batch_group_count, precision, preferred_element_type,
        require_fused=True)
