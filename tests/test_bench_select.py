"""bench.py measured-mode auto-selection (no device work — pure logic).

A default bench run (BENCH_QUANT unset) must pick the fastest quant mode
previously MEASURED at the same bench setting, with a >2% noise guard
against the best recorded "static" run, so an unattended measurement
campaign carries its winner into later default runs.
"""

import importlib
import json
import os
import sys


def _load_bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return importlib.reload(bench)


def _with_env(monkeypatch, records, **env):
    for k in ("BENCH_QUANT", "BENCH_MODEL", "BENCH_BATCH", "BENCH_STEPS",
              "BENCH_FLASH", "BENCH_FF", "BENCH_FUSED_GN", "BENCH_AUTOSELECT",
              "D3ROMA_WINO_CHUNK"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("BENCH_RECORDS", str(records))
    for k, v in env.items():
        monkeypatch.setenv(k, v)


def _write_records(path, rows):
    base = dict(model="ldm", batch=16, steps=10, flash="3", ff="1",
                fused_gn="0", wc="0", ts=0)
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(dict(base, **row)) + "\n")


def test_autoselect_flips_to_measured_winner(tmp_path, monkeypatch):
    bench = _load_bench()
    rec = tmp_path / "results.jsonl"
    _write_records(rec, [
        dict(quant="static", fps=15.3),
        dict(quant="wino_static", wc="1", fps=17.8),
    ])
    _with_env(monkeypatch, rec)
    bench._maybe_autoselect_quant()
    assert os.environ.get("BENCH_QUANT") == "wino_static"
    assert os.environ.get("D3ROMA_WINO_CHUNK") == "1"


def test_autoselect_noise_guard_and_static_requirement(tmp_path, monkeypatch):
    bench = _load_bench()
    rec = tmp_path / "results.jsonl"
    # within 2% of static -> no flip
    _write_records(rec, [
        dict(quant="static", fps=15.3),
        dict(quant="wino_static", fps=15.5),
    ])
    _with_env(monkeypatch, rec)
    bench._maybe_autoselect_quant()
    assert os.environ.get("BENCH_QUANT") is None
    # no static record at this setting -> no flip either
    _write_records(rec, [dict(quant="wino_static", fps=30.0)])
    bench._maybe_autoselect_quant()
    assert os.environ.get("BENCH_QUANT") is None


def test_autoselect_respects_setting_and_overrides(tmp_path, monkeypatch):
    bench = _load_bench()
    rec = tmp_path / "results.jsonl"
    _write_records(rec, [
        dict(quant="static", fps=15.3),
        dict(quant="wino_static", fps=20.0, batch=1),  # different setting
    ])
    _with_env(monkeypatch, rec)
    bench._maybe_autoselect_quant()
    assert os.environ.get("BENCH_QUANT") is None

    # explicit BENCH_QUANT wins over any record
    _write_records(rec, [
        dict(quant="static", fps=15.3),
        dict(quant="wino_static", fps=20.0),
    ])
    _with_env(monkeypatch, rec, BENCH_QUANT="0")
    bench._maybe_autoselect_quant()
    assert os.environ.get("BENCH_QUANT") == "0"

    # BENCH_AUTOSELECT=0 disables
    _with_env(monkeypatch, rec, BENCH_AUTOSELECT="0")
    bench._maybe_autoselect_quant()
    assert os.environ.get("BENCH_QUANT") is None


def test_record_result_roundtrip(tmp_path, monkeypatch):
    bench = _load_bench()
    rec = tmp_path / "sub" / "results.jsonl"
    _with_env(monkeypatch, rec, BENCH_QUANT="wino_static",
              D3ROMA_WINO_CHUNK="1")
    bench._record_result(18.123456)
    _with_env(monkeypatch, rec)
    bench._maybe_autoselect_quant()
    # only a wino record exists (no static) -> no flip, but file is valid
    with open(rec) as f:
        row = json.loads(f.read())
    assert row["quant"] == "wino_static" and row["wc"] == "1"
    assert row["fps"] == 18.123
