"""Re-sweep UNet-step / VAE configs after the platform-stack upgrade.

The tunnel outage came back with a different compiler/runtime: direct
bf16 convs now run ~187 TFLOP/s at the latent sites (was ~107) while
int8 convs collapsed to ~18-34 (was 107-163) — see /tmp/wino_probe64.log.
Every round-2 config decision (static int8 default, whole-row int8
attention, fused GEGLU) was measured on the old stack and must be
re-validated. Scan-amortized sustained protocol, params as jit args.

usage: python _scratch/stack_resweep.py [unet|vae|all] [config ...]
env: SW_SCAN (default 30 unet / 8 vae), SW_BATCH (16)
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_bench_cache")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from d3roma_tpu.models import AutoencoderKL, UNet2DCondition, widened_in_channels

B = int(os.environ.get("SW_BATCH", "16"))
H, W = 360, 640
in_ch = widened_in_channels("rgb+raw")  # 12

UNET_CONFIGS = {
    # name: (use_flash_attention, fused_ff, quant)
    "r2-release": ("pallas-self", True, "static"),   # round-2 best
    "bf16-wr-ff": ("pallas-self", True, False),
    "bf16-wr": ("pallas-self", False, False),
    "bf16-flash": (True, False, False),
    "bf16-xla": (False, False, False),
    "int8-xla": (False, False, "static"),
    "bf16-flash-ff": (True, True, False),
    "dense8-wr": ("pallas-self", False, "dense"),
    "dense8-wr-ff": ("pallas-self", True, "dense"),
}
VAE_CONFIGS = {"bf16": False, "int8": "static"}


def timed(name, run, fetch, scan, flops=None):
    run(True)  # compile + warm
    t0 = time.time()
    run(False)
    fetch()
    dt = (time.time() - t0) / scan
    rate = f"  {flops/dt/1e12:.1f} TFLOP/s" if flops else ""
    print(f"  {name}: {dt*1e3:.2f} ms/iter (batch {B}, "
          f"{dt*1e3/B:.2f} ms/frame){rate}", flush=True)
    return dt


def sweep_unet(names):
    from d3roma_tpu.utils.flops import unet2d_condition_flops

    scan = int(os.environ.get("SW_SCAN", "30"))
    key = jax.random.PRNGKey(0)
    lat0 = jax.random.normal(key, (B, H // 8, W // 8, in_ch), jnp.bfloat16)
    ctx = jnp.zeros((B, 2, 1024), jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)

    base = UNet2DCondition(in_channels=in_ch, out_channels=4, dtype=jnp.bfloat16)
    params = jax.jit(base.init)(key, lat0[:1], jnp.array([0]), ctx[:1])["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    params = jax.device_put(params)
    flops = unet2d_condition_flops(H // 8, W // 8, in_channels=in_ch,
                                   ctx_len=2) * B

    for name in names:
        fa, ff, q = UNET_CONFIGS[name]
        unet = UNet2DCondition(in_channels=in_ch, out_channels=4,
                               use_flash_attention=fa, fused_ff=ff, quant=q,
                               dtype=jnp.bfloat16)

        def step(p, c):
            def body(carry, _):
                out = unet.apply({"params": p}, carry, t, ctx)
                nxt = jnp.concatenate(
                    [out.astype(jnp.bfloat16) * 1e-3 + carry[..., :4],
                     carry[..., 4:]], -1)
                return nxt, ()
            return lax.scan(body, c, None, length=scan)[0]

        runj = jax.jit(step)
        out = {}

        def run(block):
            out["c"] = runj(params, lat0)
            if block:
                jax.block_until_ready(out["c"])

        try:
            timed(name, run, lambda: np.asarray(out["c"][0, 0, 0, :1]),
                  scan, flops)
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


def sweep_vae(names):
    from d3roma_tpu.utils.flops import vae_decoder_flops, vae_encoder_flops

    scan = int(os.environ.get("SW_SCAN", "8"))
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (B, H, W, 3), jnp.bfloat16)
    z = jax.random.normal(key, (B, H // 8, W // 8, 4), jnp.bfloat16)

    base = AutoencoderKL(dtype=jnp.bfloat16)
    params = jax.jit(base.init)(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    params = jax.device_put(params)
    dec_fl = vae_decoder_flops(H // 8, W // 8) * B
    enc_fl = vae_encoder_flops(H, W) * B

    for name in names:
        q = VAE_CONFIGS[name]
        vae = AutoencoderKL(quant=q, dtype=jnp.bfloat16)

        def dec_step(p, c):
            def body(carry, _):
                y = vae.apply({"params": p}, carry, method=vae.decode)
                upd = (y[..., ::8, ::8, :1].mean() * 1e-6).astype(carry.dtype)
                return carry + upd, ()
            return lax.scan(body, c, None, length=scan)[0]

        def enc_step(p, c):
            def body(carry, _):
                post = vae.apply({"params": p}, carry, method=vae.encode)
                m = post.mean if hasattr(post, "mean") else post[0]
                return carry + (m[..., :1].mean() * 1e-6).astype(carry.dtype), ()
            return lax.scan(body, c, None, length=scan)[0]

        for tag, fn, x0, fl in (("decode", dec_step, z, dec_fl),
                                ("encode", enc_step, img, enc_fl)):
            runj = jax.jit(fn)
            out = {}

            def run(block):
                out["c"] = runj(params, x0)
                if block:
                    jax.block_until_ready(out["c"])

            try:
                timed(f"{name}-{tag}", run,
                      lambda: np.asarray(out["c"].reshape(-1)[:1]), scan, fl)
            except Exception as e:  # noqa: BLE001
                print(f"  {name}-{tag}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    picks = sys.argv[2:]
    if what in ("unet", "all"):
        print(f"UNet step sweep (B={B}, 45x80 latent, 2-token ctx):",
              flush=True)
        sweep_unet(picks or list(UNET_CONFIGS))
    if what in ("vae", "all"):
        print(f"VAE sweep (B={B}, {H}x{W}):", flush=True)
        sweep_vae(picks or list(VAE_CONFIGS))
