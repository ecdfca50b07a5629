"""Smoke-test the driver-facing artifacts: bench.py's pipeline end-to-end at
tiny size (CPU) and __graft_entry__'s single-chip entry."""

import json
import sys

import numpy as np


def test_bench_pipeline_tiny(monkeypatch, capsys):
    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setattr(bench, "NB", 64)
    rows, cols, blocks, b = bench.build_block_band(nb=64)
    t_ref = bench.scipy_time(rows, cols, blocks, b, iters=1)
    t_tpu = bench.tpu_time(rows, cols, blocks, b, iters=1)
    assert t_ref > 0 and t_tpu > 0
    # the reported JSON line parses and carries the required keys
    monkeypatch.setattr(bench, "build_block_band", lambda: (rows, cols, blocks, b))
    monkeypatch.setattr(bench, "scipy_time", lambda *a, **k: t_ref)
    monkeypatch.setattr(bench, "tpu_time", lambda *a, **k: t_tpu)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0


def test_entry_shapes():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    assert out.shape == (512, 64)
    assert not np.any(np.isnan(np.asarray(out)))
