"""Chipless AOT compile-check of pipeline programs against a v5e topology.

No tunnel, no chip: libtpu compiles locally (incl. Mosaic kernels), so
VMEM overflows / alignment errors / giant-program pathologies surface in
seconds instead of a TPU round trip. Checks the exact programs that
matter this round:

  PB_WHAT=b1scan     the batch-1 5-step denoise scan (relay-killer repro)
  PB_WHAT=b16wino    batch-16 wino_static UNet step
  PB_WHAT=b16vae     batch-16 wino VAE decode
  PB_WHAT=b32enc     batch-32 wino VAE encode (needs D3ROMA_WINO_CHUNK=1)
  PB_WHAT=b1wino     batch-1 5-step wino denoise scan
  PB_WHAT=tp4        flagship bf16 UNet step, TP4 over the 2x2 topology
  PB_WHAT=tp4fast    flagship fast-kernel UNet step (whole-row attn +
                     fused GEGLU via their shard_map TP compositions,
                     static int8), batch 1, TP4 — the composed batch-1
                     latency config (VERDICT r4 #4)
  PB_WHAT=serving_export  flagship TPU serving artifact (jax.export) builds
  PB_WHAT=all        everything

usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu TPU_SKIP_MDS_QUERY=1 \
           python _scratch/aot_check.py [what]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WHAT = (sys.argv[1] if len(sys.argv) > 1 else
        os.environ.get("PB_WHAT", "all"))

topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
mesh = Mesh(np.array(topo.devices).reshape(-1)[:1], "x")
S = NamedSharding(mesh, P())


def check(name, fn, *shape_structs, static=None):
    t0 = time.time()
    try:
        jf = jax.jit(fn, in_shardings=(S,) * len(shape_structs),
                     out_shardings=S, static_argnames=static)
        jf.lower(*shape_structs).compile()
        print(f"PASS {name} in {time.time()-t0:.0f}s", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name} after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        return False


from d3roma_tpu.models import AutoencoderKL, UNet2DCondition, widened_in_channels
from d3roma_tpu.models.vae import decode_latent
from d3roma_tpu.ops import ScheduleConfig
from d3roma_tpu.pipelines import SamplerSpec
from d3roma_tpu.pipelines.sampling import latent_decode_images, latent_denoise

H, W = 360, 640
in_ch = widened_in_channels("rgb+raw")
sched = ScheduleConfig(
    num_train_timesteps=1000, beta_schedule="scaled_linear",
    beta_start=0.00085, beta_end=0.012, prediction_type="v_prediction",
    clip_sample=False, timestep_spacing="leading", steps_offset=1,
)
spec = SamplerSpec("my_ddim", sched)
tables = sched.tables()


def param_structs(model, *init_args):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *init_args)
    return shapes["params"]


def bf16_tree(t):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, jnp.bfloat16 if x.dtype == jnp.float32 else x.dtype), t)


if WHAT in ("b1scan", "all"):
    unet = UNet2DCondition(in_channels=in_ch, out_channels=4,
                           use_flash_attention="pallas-self", fused_ff=True,
                           dtype=jnp.bfloat16)
    p = bf16_tree(param_structs(
        unet, jnp.zeros((1, H // 8, W // 8, in_ch)), jnp.array([0]),
        jnp.zeros((1, 2, 1024))))

    def scan_fn(params, key, conds):
        def unet_apply(mi, t, ctx):
            return unet.apply({"params": params}, mi, t, ctx)
        return latent_denoise(unet_apply, jnp.zeros((1, 2, 1024)), spec,
                              tables, key, 5, 1, conds, {}, "rgb+raw",
                              noise_dtype=jnp.float32)

    check("b1 scan 5-step 360x640", scan_fn, p,
          jax.ShapeDtypeStruct((2,), jnp.uint32),
          jax.ShapeDtypeStruct((1, H // 8, W // 8, 8), jnp.float32))

if WHAT in ("b16wino", "all"):
    unet = UNet2DCondition(in_channels=in_ch, out_channels=4,
                           use_flash_attention="pallas-self", fused_ff=True,
                           quant="wino_static", dtype=jnp.bfloat16)
    p = bf16_tree(param_structs(
        unet, jnp.zeros((1, H // 8, W // 8, in_ch)), jnp.array([0]),
        jnp.zeros((1, 2, 1024))))

    def step_fn(params, x, ctx):
        return unet.apply({"params": params}, x, jnp.full((16,), 500), ctx)

    check("b16 wino_static UNet step", step_fn, p,
          jax.ShapeDtypeStruct((16, H // 8, W // 8, in_ch), jnp.bfloat16),
          jax.ShapeDtypeStruct((16, 2, 1024), jnp.bfloat16))

if WHAT in ("b16vae", "all"):
    vae = AutoencoderKL(quant="wino", dtype=jnp.bfloat16)
    vp = bf16_tree(param_structs(vae, jnp.zeros((1, 64, 64, 3))))

    def dec_fn(params, kept):
        def va(x, method):
            return vae.apply({"params": params}, x, method=method)
        return latent_decode_images(lambda z: decode_latent(va, z), kept)

    check("b16 wino VAE decode", dec_fn, vp,
          jax.ShapeDtypeStruct((1, 16, H // 8, W // 8, 4), jnp.float32))

if WHAT in ("b32enc", "all"):
    # batch-32 wino VAE encode (2 conds x batch 16): full-res slabs are
    # 1.9 GB -> requires D3ROMA_WINO_CHUNK=1 to compile within HBM
    vae = AutoencoderKL(quant="wino", dtype=jnp.bfloat16)
    vp = bf16_tree(param_structs(vae, jnp.zeros((1, 64, 64, 3))))

    from d3roma_tpu.models.vae import encode_image_to_latent

    def enc_fn(params, imgs):
        def va(x, method):
            return vae.apply({"params": params}, x, method=method)
        return encode_image_to_latent(va, imgs)

    check("b32 wino VAE encode", enc_fn, vp,
          jax.ShapeDtypeStruct((32, H, W, 3), jnp.bfloat16))

if WHAT in ("b1wino", "all"):
    # the watcher's b1 decomp wino cell: 5-step scan at batch 1 with
    # wino convs — de-risk its compile before spending a TPU window
    unet = UNet2DCondition(in_channels=in_ch, out_channels=4,
                           use_flash_attention="pallas-self", fused_ff=True,
                           quant="wino", dtype=jnp.bfloat16)
    p = bf16_tree(param_structs(
        unet, jnp.zeros((1, H // 8, W // 8, in_ch)), jnp.array([0]),
        jnp.zeros((1, 2, 1024))))

    def scan1_fn(params, key, conds):
        def unet_apply(mi, t, ctx):
            return unet.apply({"params": params}, mi, t, ctx)
        return latent_denoise(unet_apply, jnp.zeros((1, 2, 1024)), spec,
                              tables, key, 5, 1, conds, {}, "rgb+raw",
                              noise_dtype=jnp.float32)

    check("b1 wino scan 5-step 360x640", scan1_fn, p,
          jax.ShapeDtypeStruct((2,), jnp.uint32),
          jax.ShapeDtypeStruct((1, H // 8, W // 8, 8), jnp.float32))


if WHAT in ("serving_export", "all"):
    # the deployment artifact at production scale: flagship release
    # serving program (batch 16, 10-step, throughput kernels) exported
    # for the TPU platform from this CPU host (serving/aot.py)
    from d3roma_tpu.guidance import FlowGuidance
    from d3roma_tpu.ops.normalizer import Normalizer
    from d3roma_tpu.pipelines import GuidedLatentDiffusionPipeline
    from d3roma_tpu.serving import ServingSignature, export_serving

    unet = UNet2DCondition(in_channels=in_ch, out_channels=4,
                           use_flash_attention="pallas-self", fused_ff=True,
                           quant="static", dtype=jnp.bfloat16)
    vae = AutoencoderKL(quant="static", dtype=jnp.bfloat16)
    p = bf16_tree(param_structs(
        unet, jnp.zeros((1, H // 8, W // 8, in_ch)), jnp.array([0]),
        jnp.zeros((1, 2, 1024))))
    vp = bf16_tree(param_structs(vae, jnp.zeros((1, 64, 64, 3))))
    pipe = GuidedLatentDiffusionPipeline(
        unet=unet, unet_params=p, vae=vae, vae_params=vp,
        text_embed=jax.ShapeDtypeStruct((1, 2, 1024), jnp.bfloat16),
        spec=spec, guidance=FlowGuidance(flow_guidance_weight=0.0),
        normalizer=Normalizer(ssi=False, mode="average", num_chs=1,
                              ch_bounds=(128.0,), ch_gammas=(1.0,)))
    sig = ServingSignature(batch=16, height=H, width=W,
                           num_inference_steps=10,
                           num_intermediate_images=1,
                           cond_channels="rgb+raw")
    t0 = time.time()
    try:
        exp = export_serving(pipe, sig, platforms=("tpu",))
        blob = exp.serialize()
        print(f"PASS flagship serving export in {time.time()-t0:.0f}s "
              f"({len(blob)/1e6:.1f} MB artifact)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL flagship serving export after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)

if WHAT in ("tp4", "all"):
    # real-scale flagship UNet step tensor-parallel over all 4 topology
    # chips: validates the parallel/tensor.py specs lower + compile at
    # the 320/640/1280 channel dims on actual TPU codegen (GSPMD
    # collectives included) without a chip
    from d3roma_tpu.parallel.tensor import tp_param_shardings
    from jax.sharding import PartitionSpec as P4

    mesh4 = Mesh(np.array(topo.devices).reshape(-1)[:4].reshape(1, 4),
                 ("data", "model"))
    unet = UNet2DCondition(in_channels=in_ch, out_channels=4,
                           use_flash_attention=False, dtype=jnp.bfloat16)
    p = bf16_tree(param_structs(
        unet, jnp.zeros((1, H // 8, W // 8, in_ch)), jnp.array([0]),
        jnp.zeros((1, 2, 1024))))

    def unet_fn(params, x, t, ctx):
        return unet.apply({"params": params}, x, t, ctx)

    psh = tp_param_shardings(p, mesh4)
    bs = NamedSharding(mesh4, P4("data"))
    t0 = time.time()
    try:
        jf = jax.jit(unet_fn, in_shardings=(psh, bs, bs, bs),
                     out_shardings=bs)
        jf.lower(p,
                 jax.ShapeDtypeStruct((8, H // 8, W // 8, in_ch), jnp.bfloat16),
                 jax.ShapeDtypeStruct((8,), jnp.int32),
                 jax.ShapeDtypeStruct((8, 2, 1024), jnp.bfloat16)).compile()
        print(f"PASS flagship TP4 UNet step in {time.time()-t0:.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL flagship TP4 UNet step after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if WHAT in ("tp4fast", "all"):
    # the COMPOSED batch-1 latency config: fast_inference kernels +
    # TP4 via shard_map (ops/pallas mha_attention_tp / geglu_ff_tp) at
    # flagship shapes, static int8 — compile-only, chipless
    from d3roma_tpu.parallel.tensor import tp_param_shardings
    from jax.sharding import PartitionSpec as P4

    mesh4f = Mesh(np.array(topo.devices).reshape(-1)[:4].reshape(1, 4),
                  ("data", "model"))
    unet_f = UNet2DCondition(in_channels=in_ch, out_channels=4,
                             use_flash_attention="pallas-self",
                             fused_ff=True, quant="static",
                             tp_mesh=mesh4f, dtype=jnp.bfloat16)
    p = bf16_tree(param_structs(
        unet_f, jnp.zeros((1, H // 8, W // 8, in_ch)), jnp.array([0]),
        jnp.zeros((1, 2, 1024))))

    def unet_fast_fn(params, x, t, ctx):
        return unet_f.apply({"params": params}, x, t, ctx)

    psh = tp_param_shardings(p, mesh4f)
    bs = NamedSharding(mesh4f, P4("data"))
    t0 = time.time()
    try:
        jf = jax.jit(unet_fast_fn, in_shardings=(psh, bs, bs, bs),
                     out_shardings=bs)
        jf.lower(p,
                 jax.ShapeDtypeStruct((1, H // 8, W // 8, in_ch), jnp.bfloat16),
                 jax.ShapeDtypeStruct((1,), jnp.int32),
                 jax.ShapeDtypeStruct((1, 2, 1024), jnp.bfloat16)).compile()
        print(f"PASS flagship TP4 fast-kernel UNet step in {time.time()-t0:.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL flagship TP4 fast-kernel UNet step after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
