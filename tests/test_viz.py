

def test_plot_schedules_script(tmp_path):
    """scripts/plot_schedules.py writes the 4 reference diagnostic
    figures (the reference's `python config.py` __main__ plots,
    config.py:216-371)."""
    from scripts.plot_schedules import main as plot_main

    rc = plot_main(["--out", str(tmp_path)])
    assert rc == 0
    import os

    for name in ("figure1_posterior_ratio.png",
                 "figure5_alphas_cumprod.png", "figure_snr.png",
                 "figure_sampled_t.png"):
        p = tmp_path / name
        assert p.exists() and os.path.getsize(p) > 1000
