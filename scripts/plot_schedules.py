#!/usr/bin/env python
"""Scheduler diagnostic figures (the reference's `python config.py`
__main__ plots — reference: config.py:216-371, reproducing iDDPM
figures 1/5, the sqrt-SNR comparison, and the importance-sampled
timestep histogram). Writes PNGs into --out (default _outputs/schedules).

  python scripts/plot_schedules.py [--out DIR]

Each figure derives from ops/schedules.ScheduleTables, so these plots
diagnose OUR tables, not torch's:

- figure1_posterior_ratio.png: beta_tilde/beta across normalized t for
  T in {4000, 1000, 128} (cosine schedule) — iDDPM Fig. 1,
- figure5_alphas_cumprod.png: alpha-bar for linear vs cosine — Fig. 5,
- figure_snr.png: sqrt SNR = sqrt(abar/(1-abar)) linear vs cosine,
- figure_sampled_t.png: histogram of loss-second-moment importance
  sampling vs uniform (ops/resample.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="_outputs/schedules")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from d3roma_tpu.ops.schedules import ScheduleConfig

    def tables(T, schedule):
        return ScheduleConfig(num_train_timesteps=T,
                              beta_schedule=schedule).tables()

    # iDDPM Figure 1: posterior-to-forward variance ratio
    plt.figure(figsize=(6, 4))
    for T in (4000, 1000, 128):
        t = tables(T, "squaredcos_cap_v2")
        ratio = np.asarray(t.posterior_variance) / np.asarray(t.betas)
        plt.plot(np.linspace(0, 1, T), ratio, label=str(T))
    plt.xlabel("t/T"); plt.ylabel(r"$\tilde\beta_t/\beta_t$")
    plt.legend(); plt.title("iDDPM Fig.1: posterior variance ratio")
    f1 = os.path.join(args.out, "figure1_posterior_ratio.png")
    plt.savefig(f1, dpi=120); plt.close()

    # iDDPM Figure 5: alpha-bar linear vs cosine
    T = 1000
    lin = tables(T, "linear")
    cos = tables(T, "squaredcos_cap_v2")
    x = np.linspace(0, 1, T)
    plt.figure(figsize=(6, 4))
    plt.plot(x, np.asarray(lin.alphas_cumprod), label="linear")
    plt.plot(x, np.asarray(cos.alphas_cumprod), label="cosine")
    plt.xlabel("t/T"); plt.ylabel(r"$\bar\alpha_t$")
    plt.legend(); plt.title("iDDPM Fig.5: alpha-bar schedules")
    f5 = os.path.join(args.out, "figure5_alphas_cumprod.png")
    plt.savefig(f5, dpi=120); plt.close()

    # sqrt-SNR comparison
    plt.figure(figsize=(6, 4))
    for name, t in (("linear", lin), ("cosine", cos)):
        ab = np.asarray(t.alphas_cumprod)
        snr = ab / np.maximum(1.0 - ab, 1e-12)
        plt.semilogy(x, np.sqrt(snr), label=f"sqrt SNR {name}")
    plt.xlabel("t/T"); plt.legend(); plt.title("sqrt SNR")
    fs = os.path.join(args.out, "figure_snr.png")
    plt.savefig(fs, dpi=120); plt.close()

    # importance-sampled t histogram (loss-second-moment vs uniform)
    import jax
    import jax.numpy as jnp

    from d3roma_tpu.ops.resample import (
        init_loss_aware_state,
        loss_aware_weights,
        sample_timesteps,
        uniform_weights,
        update_loss_aware,
    )

    T = 128
    state = init_loss_aware_state(T)
    key = jax.random.PRNGKey(0)
    # synthetic loss curve: late (noisy) timesteps lose more
    for _ in range(40):
        key, k1 = jax.random.split(key)
        ts, _ = sample_timesteps(k1, loss_aware_weights(state), 256)
        losses = 1.0 + 4.0 * (jnp.asarray(ts, jnp.float32) / T) ** 2
        state = update_loss_aware(state, ts, losses)
    key, k = jax.random.split(key)
    ts_imp, _ = sample_timesteps(k, loss_aware_weights(state), 4096)
    ts_uni, _ = sample_timesteps(k, uniform_weights(T), 4096)
    plt.figure(figsize=(6, 4))
    plt.hist(np.asarray(ts_uni), bins=32, alpha=0.5, label="uniform")
    plt.hist(np.asarray(ts_imp), bins=32, alpha=0.5,
             label="loss 2nd-moment")
    plt.xlabel("t"); plt.legend(); plt.title("importance-sampled t")
    ft = os.path.join(args.out, "figure_sampled_t.png")
    plt.savefig(ft, dpi=120); plt.close()

    for f in (f1, f5, fs, ft):
        print(f"wrote {f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
