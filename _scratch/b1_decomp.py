"""Batch-1 per-stage decomposition at the streaming setting (640x360,
5-step DDIM): sustained ms for the VAE-encode, denoise-scan, and
VAE-decode stage programs separately, params as jit args (a closure-
captured tree ships GBs of constants to the remote compiler — see
pipelines/pipeline.py::calibrate).

Env: PB_H/PB_W/PB_BATCH/PB_STEPS/PB_REPS, PB_KERNELS=1 (whole-row attn +
fused GEGLU), PB_QUANT in 0|dense|static (UNet+VAE quant mode).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_bench_cache")
import jax
import jax.numpy as jnp
import numpy as np

H = int(os.environ.get("PB_H", "360"))
W = int(os.environ.get("PB_W", "640"))
BATCH = int(os.environ.get("PB_BATCH", "1"))
STEPS = int(os.environ.get("PB_STEPS", "5"))
REPS = int(os.environ.get("PB_REPS", "30"))
KERNELS = os.environ.get("PB_KERNELS", "1") == "1"
QUANT = os.environ.get("PB_QUANT", "0")

from d3roma_tpu.models import AutoencoderKL, UNet2DCondition, widened_in_channels
from d3roma_tpu.models.vae import decode_latent, encode_image_to_latent
from d3roma_tpu.ops import ScheduleConfig
from d3roma_tpu.pipelines import SamplerSpec
from d3roma_tpu.pipelines.sampling import (
    latent_decode_images, latent_denoise, latent_encode_conds)

in_ch = widened_in_channels("rgb+raw")
quant = QUANT if QUANT in ("dense", "static", "mxu",
                           "wino", "wino_static") else False
kw = {}
vkw = {}
if os.environ.get("PB_TINY", "0") == "1":  # CPU smoke: shrunken model
    kw = dict(block_out_channels=(32, 64, 64, 64), attention_head_dim=8,
              cross_attention_dim=1024, norm_groups=8)
    vkw = dict(block_out_channels=(16, 16, 32, 32), norm_groups=8)
unet = UNet2DCondition(in_channels=in_ch, out_channels=4,
                       use_flash_attention="pallas-self" if KERNELS else False,
                       fused_ff=KERNELS, quant=quant, dtype=jnp.bfloat16, **kw)
vae = AutoencoderKL(quant=quant, dtype=jnp.bfloat16, **vkw)
key = jax.random.PRNGKey(0)
unet_params = jax.jit(unet.init)(
    key, jnp.zeros((1, H // 8, W // 8, in_ch)), jnp.array([0]),
    jnp.zeros((1, 2, 1024)))["params"]
vae_params = jax.jit(vae.init)(jax.random.fold_in(key, 1),
                               jnp.zeros((1, 64, 64, 3)))["params"]
cast = lambda t: jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
unet_params, vae_params = cast(unet_params), cast(vae_params)
sched = ScheduleConfig(
    num_train_timesteps=1000, beta_schedule="scaled_linear",
    beta_start=0.00085, beta_end=0.012, prediction_type="v_prediction",
    clip_sample=False, timestep_spacing="leading", steps_offset=1,
)
spec = SamplerSpec("my_ddim", sched)
tables = sched.tables()


def _vap(params):
    def apply(x, method):
        return vae.apply({"params": params}, x, method=method)
    return apply


def enc_fn(params, r, d):
    return latent_encode_conds(
        lambda x: encode_image_to_latent(_vap(params), x),
        "rgb+raw", rgb=r, sim_disp=d)


DC = int(os.environ.get("PB_DEEPCACHE", "1"))


def scan_fn(params, k, c):
    def unet_apply(mi, t, ctx):
        return unet.apply({"params": params}, mi, t, ctx)
    kw2 = {}
    if DC > 1:
        kw2 = dict(
            cache_interval=DC,
            unet_apply_trunk=lambda mi, t, ctx: unet.apply(
                {"params": params}, mi, t, ctx, return_trunk=True),
            unet_apply_cached=lambda mi, t, ctx, tr: unet.apply(
                {"params": params}, mi, t, ctx, cached_trunk=tr))
    return latent_denoise(
        unet_apply, jnp.zeros((1, 2, 1024)), spec, tables, k,
        STEPS, 1, c, {}, "rgb+raw", noise_dtype=jnp.float32, **kw2)


def dec_fn(params, z):
    return latent_decode_images(lambda zz: decode_latent(_vap(params), zz), z)


enc_j, scan_j, dec_j = jax.jit(enc_fn), jax.jit(scan_fn), jax.jit(dec_fn)

rgbs = [jax.random.normal(jax.random.PRNGKey(70 + i), (BATCH, H, W, 3)) * 0.5
        for i in range(REPS)]
raws = [jnp.abs(jax.random.normal(jax.random.PRNGKey(700 + i),
                                  (BATCH, H, W, 1))) * 0.5
        for i in range(REPS)]
conds0 = jax.random.normal(jax.random.PRNGKey(9),
                           (BATCH, H // 8, W // 8, 8), jnp.float32)
kept0 = jax.random.normal(jax.random.PRNGKey(2),
                          (1, BATCH, H // 8, W // 8, 4), jnp.float32)

print(f"# b1 decomp: {H}x{W} b{BATCH} s{STEPS} kernels={KERNELS} "
      f"quant={QUANT} dc={DC}", flush=True)


def timed(name, launch, fetch):
    t0 = time.time()
    out = None
    for i in range(REPS):
        out = launch(i)
    fetch(out)
    dt = (time.time() - t0) / REPS
    print(f"{name}: {1000*dt:.1f} ms sustained "
          f"({1000*dt/BATCH:.1f} ms/frame)", flush=True)
    return dt


# warmup/compile each stage (retry once: relay flakes exist)
for name, warm in (("enc", lambda: enc_j(vae_params, rgbs[0], raws[0])),
                   ("scan", lambda: scan_j(unet_params, jax.random.PRNGKey(1),
                                           conds0)),
                   ("dec", lambda: dec_j(vae_params, kept0))):
    for attempt in (0, 1):
        try:
            t0 = time.time()
            jax.block_until_ready(warm())
            print(f"# {name} compiled in {time.time()-t0:.0f}s", flush=True)
            break
        except Exception as e:  # noqa: BLE001
            print(f"# {name} warmup attempt {attempt}: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            if attempt:
                sys.exit(1)
            time.sleep(20)

d_enc = timed("ENC ", lambda i: enc_j(vae_params, rgbs[i], raws[i]),
              lambda out: np.asarray(out[0][0, 0, 0, :4]))
d_scan = timed("SCAN", lambda i: scan_j(unet_params,
                                        jax.random.PRNGKey(1000 + i), conds0),
               lambda out: np.asarray(out[0, 0, 0, 0, :4]))
d_dec = timed("DEC ", lambda i: dec_j(vae_params, kept0 * (1 + 1e-4 * i)),
              lambda out: np.asarray(out.images[0, 0, 0, :4]))
tot = d_enc + d_scan + d_dec
print(f"TOTAL {1000*tot:.1f} ms/frame ({1/tot:.2f} fps) | "
      f"per-UNet-step {1000*d_scan/STEPS:.1f} ms", flush=True)
