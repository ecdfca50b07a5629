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
    t_tpu, hbm_bytes = bench.tpu_time(rows, cols, blocks, b, iters=1)
    assert t_ref > 0 and t_tpu > 0
    # the banded plan (and so the plan-derived HBM byte count) is TPU-only;
    # on the CPU smoke run the fused-kernel fallback reports None
    assert hbm_bytes is None or hbm_bytes > 0
    # the reported JSON line parses and carries the required keys
    monkeypatch.setattr(bench, "build_block_band", lambda: (rows, cols, blocks, b))
    monkeypatch.setattr(bench, "scipy_time", lambda *a, **k: t_ref)
    monkeypatch.setattr(bench, "tpu_time", lambda *a, **k: (t_tpu, hbm_bytes))
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    # required driver keys plus the round-3 roofline sidecar fields
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0


def test_entry_shapes():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    assert out.shape == (512, 64)
    assert not np.any(np.isnan(np.asarray(out)))


def test_bench_direct_bell_construction_parity(monkeypatch):
    # tpu_time builds the BELL directly (pattern host-side, values device-
    # generated): band structure and kernel/XLA parity must hold
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench
    from sparse_tpu.formats.bell import BELL, bell_spmm, bell_todense
    from sparse_tpu.ops.pallas_bell import (
        bell_banded_prepare,
        bell_spmm_pallas_banded,
    )
    from sparse_tpu.ops.segmented import INDEX_DTYPE

    nb, BSZ = 40, bench.BSZ
    rows, cols, _, _ = bench.build_block_band(nb=nb)
    lens = np.bincount(rows, minlength=nb)
    Lb = int(lens.max())
    starts = np.zeros(nb + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    slot = np.arange(rows.size) - starts[rows]
    cols_np = np.zeros((nb, Lb), np.int32)
    cols_np[rows, slot] = cols
    slot_valid = np.arange(Lb)[None, :] < lens[:, None]
    pool = jax.random.normal(jax.random.PRNGKey(0), (1021, BSZ, BSZ),
                             jnp.float32) * 0.01
    idx = jnp.asarray((np.arange(nb * Lb) % 1021).astype(np.int32))
    blocks = (pool[idx].reshape(nb, Lb, BSZ, BSZ)
              * jnp.asarray(slot_valid, jnp.float32)[:, :, None, None])
    a = BELL(cols=jnp.asarray(cols_np, INDEX_DTYPE), blocks=blocks,
             n=nb * BSZ, bsz=BSZ)
    dense = np.asarray(bell_todense(a)).reshape(nb, BSZ, nb, BSZ)
    nzb = np.any(dense != 0, axis=(1, 3))
    expect = np.zeros((nb, nb), bool)
    for off in range(-2, 3):
        expect |= np.eye(nb, k=off, dtype=bool)
    np.testing.assert_array_equal(nzb, expect)
    kit = bell_banded_prepare(a, row_tile=5, slot_valid=slot_valid)
    bj = jax.random.normal(jax.random.PRNGKey(1), (nb * BSZ, 16),
                           jnp.float32) * 0.01
    got = bell_spmm_pallas_banded(a, bj, kit.plan, tiles=kit.tiles,
                                  interpret=True)
    want = bell_spmm(a, bj, prefer_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-7)
