"""One-shot TPU measurement session (run when the tunnel is up).

Covers: (1) tunnel sanity, (2) MXU precision ladder rate + accuracy,
(3) segment-tile SpMV wsub sweep at the 10M-nnz band.
bench.py and benchmarks/suite.py run separately after this.
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np

T0 = time.time()
def mark(s):
    print(f"[{time.time()-T0:7.1f}s] {s}", flush=True)

import jax, jax.numpy as jnp
mark(f"backend={jax.default_backend()}")
assert jax.default_backend() == "tpu"

# ---- 1. sanity: upload + matmul round trip
x = np.ones((8, 1024, 1024), np.float32)
t = time.time(); xd = jax.device_put(x); xd.block_until_ready()
mark(f"32MB upload {time.time()-t:.2f}s")
t = time.time(); s = float(jnp.sum(xd)); mark(f"sum fetch {time.time()-t:.2f}s ({s:.0f})")

# ---- 2. precision ladder: chained f32 matmul at 2048^3, all precisions
from functools import partial

n = 2048
rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32) * 0.03)
b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32) * 0.03)

@partial(jax.jit, static_argnames=("prec",))
def chain_mm(a, b, prec):
    def body(_, c):
        return jnp.matmul(a, c, precision=prec) * 0.05
    return jnp.sum(jax.lax.fori_loop(0, 8, body, b))

for prec in ("default", "high", "highest"):
    p = dict(default=jax.lax.Precision.DEFAULT, high=jax.lax.Precision.HIGH,
             highest=jax.lax.Precision.HIGHEST)[prec]
    float(chain_mm(a, b, p))
    best = np.inf
    for _ in range(3):
        t = time.perf_counter(); float(chain_mm(a, b, p))
        best = min(best, (time.perf_counter() - t) / 8)
    mark(f"matmul {n}^3 f32 {prec}: {2*n**3/best/1e12:.2f} TFLOP/s ({best*1e3:.2f} ms)")

# accuracy vs f64 host oracle at 512^2
ns = 512
aa = rng.standard_normal((ns, ns)).astype(np.float32) * 0.1
bb = rng.standard_normal((ns, ns)).astype(np.float32) * 0.1
ref = aa.astype(np.float64) @ bb.astype(np.float64)
for prec in ("default", "high", "highest"):
    p = dict(default=jax.lax.Precision.DEFAULT, high=jax.lax.Precision.HIGH,
             highest=jax.lax.Precision.HIGHEST)[prec]
    got = np.asarray(jnp.matmul(jnp.asarray(aa), jnp.asarray(bb), precision=p))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    mark(f"matmul accuracy {prec}: max rel err {rel:.3e}")

# ---- 3. segment-tile wsub sweep (suite's banded config: 500k rows, ~10M nnz)
from sparse_tpu import CSR
from sparse_tpu.ops.pallas_csr import build_seg_tiles, csr_smvm_segtile

rng = np.random.default_rng(4)
nn = mm = 500_000
per_row = 20
rows = np.repeat(np.arange(nn, dtype=np.int64), per_row)
cols = np.clip(rows + rng.integers(-1000, 1000, rows.size), 0, mm - 1)
order = np.lexsort((cols, rows)); rows, cols = rows[order], cols[order]
keep = np.ones(rows.size, bool)
keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
rows, cols = rows[keep], cols[keep]
nnz = rows.size
vals = (rng.standard_normal(nnz) * 0.01).astype(np.float32)
indptr = np.zeros(nn + 1, np.int64)
np.cumsum(np.bincount(rows, minlength=nn), out=indptr[1:])
a = CSR(data=jnp.asarray(vals), indices=jnp.asarray(cols.astype(np.int32)),
        indptr=jnp.asarray(indptr.astype(np.int32)), shape=(nn, mm))
mark(f"band matrix on device nnz={nnz}")
v0 = jnp.asarray(rng.standard_normal(mm).astype(np.float32))

@jax.jit
def chain_spmv(v, a, plan):
    return jnp.sum(jax.lax.fori_loop(
        0, 5, lambda _, v: csr_smvm_segtile(a, v, plan), v))

for wsub in (8, 16, 32):
    t = time.time()
    plan = build_seg_tiles(a, wsub=wsub)
    jax.block_until_ready(plan.vals)
    t_build = time.time() - t
    float(chain_spmv(v0, a, plan))
    best = np.inf
    for _ in range(3):
        t = time.perf_counter(); float(chain_spmv(v0, a, plan))
        best = min(best, (time.perf_counter() - t) / 5)
    mark(f"segtile wsub={wsub}: n_tiles={plan.n_tiles} fill={plan.fill:.4f} "
         f"build={t_build:.1f}s  {nnz/best/1e9:.3f} Gnnz/s ({best*1e3:.2f} ms)")
mark("DONE")
