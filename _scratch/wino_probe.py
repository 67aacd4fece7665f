"""Winograd vs direct-conv site probe at the flagship conv shapes.

Scan-amortized sustained protocol (remote-device rules in
.claude/skills/verify): N scan iterations per measurement, distinct
inputs via carry, fetch one slice at the end. Reports effective
TFLOP/s = TRUE conv FLOPs / time for: XLA bf16 conv, XLA static-int8
conv, Winograd bf16 (ops/winograd.py).

usage: python _scratch/wino_probe.py [site_index|all]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from d3roma_tpu.ops.pallas.winograd_fused import (
    conv3x3_wino_fused,
    pick_block_tr,
)
from d3roma_tpu.ops.quant import int8_conv_general_dilated_static
from d3roma_tpu.ops.winograd import winograd_conv3x3

SITES = [  # (B, H, W, C, O) — UNet latent + VAE decode sites
    (16, 45, 80, 320, 320),
    (16, 45, 80, 320, 640),
    (16, 23, 40, 640, 640),
    (16, 45, 80, 640, 320),
    (16, 90, 160, 128, 128),
    (16, 360, 640, 128, 128),   # VAE decoder full-res block
]
SCAN = int(os.environ.get("PB_SCAN", "8"))

which = sys.argv[1] if len(sys.argv) > 1 else "all"
sites = SITES if which == "all" else [SITES[int(which)]]
if os.environ.get("PB_TINY") == "1":  # CPU smoke
    sites, SCAN = [(1, 12, 16, 8, 8)], 2


def timed(name, step, x0, w, flops):
    def body(c, _):
        y = step(c, w)
        # feed a slice of the output back so iterations are data-dependent
        return c + y[..., :1] * 1e-6, ()

    run = jax.jit(lambda c: lax.scan(body, c, None, length=SCAN)[0])
    c = run(x0)                       # compile + warm
    np.asarray(c[0, 0, 0, :1])
    t0 = time.time()
    c = run(x0)
    np.asarray(c[0, 0, 0, :1])
    dt = (time.time() - t0) / SCAN
    print(f"  {name}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TFLOP/s eff.",
          flush=True)
    return dt


for (B, H, W, C, O) in sites:
    assert C == O or O == 2 * C or C == 2 * O
    print(f"site {B}x{H}x{W} {C}->{O}:", flush=True)
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(kw, (3, 3, C, O), jnp.bfloat16) / 3.0
    flops = 2 * B * H * W * 9 * C * O

    def direct(c, wt):
        y = lax.conv_general_dilated(
            c, wt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y if O == C else (
            y[..., :C] if O > C else jnp.tile(y, (1, 1, 1, C // O)))

    def int8c(c, wt):
        y = int8_conv_general_dilated_static(
            c, wt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y if O == C else (
            y[..., :C] if O > C else jnp.tile(y, (1, 1, 1, C // O)))

    def wino(c, wt):
        y = winograd_conv3x3(c, wt)
        return y if O == C else (
            y[..., :C] if O > C else jnp.tile(y, (1, 1, 1, C // O)))

    def winof(c, wt):
        tr = pick_block_tr(c.shape)
        if tr is None:
            raise ValueError("picker: site not fused-eligible")
        y = conv3x3_wino_fused(c, wt, block_tr=tr)
        return y if O == C else (
            y[..., :C] if O > C else jnp.tile(y, (1, 1, 1, C // O)))

    def winoc(c, wt):
        # the D3ROMA_WINO_CHUNK=1 production path at big slabs:
        # serialized lax.map over batch chunks, fused kernel per chunk
        from d3roma_tpu.ops.winograd import _wino_dispatch, _wino_eligible

        prev = os.environ.get("D3ROMA_WINO_CHUNK")
        os.environ["D3ROMA_WINO_CHUNK"] = "1"
        try:
            bc = _wino_eligible(c, wt, (1, 1), "SAME", None, None,
                                ("NHWC", "HWIO", "NHWC"), 1, 1)
            if bc is None:
                raise ValueError("chunked: site not wino-eligible")
            y = _wino_dispatch(c, wt, bc)
        finally:
            if prev is None:
                os.environ.pop("D3ROMA_WINO_CHUNK", None)
            else:
                os.environ["D3ROMA_WINO_CHUNK"] = prev
        return y if O == C else (
            y[..., :C] if O > C else jnp.tile(y, (1, 1, 1, C // O)))

    for name, fn in (("xla bf16 ", direct), ("xla int8 ", int8c),
                     ("wino bf16", wino), ("wino FUSED", winof),
                     ("wino CHUNK", winoc)):
        try:
            timed(name, fn, x, w, flops)
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
