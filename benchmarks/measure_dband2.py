"""Isolate dband library-path slowdown: precomputed tiles vs in-jit densify."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bench import BSZ, K, NB, build_block_band
from sparse_tpu.formats.bell import bell_from_bsr
from sparse_tpu.formats.bsr import BSR
from sparse_tpu.ops.segmented import INDEX_DTYPE
from sparse_tpu.ops.pallas_bell import (
    build_banded_plan, bell_spmm_pallas_banded, _densify_band_tiles)

K_CHAIN = 5
rt = int(sys.argv[1])
mode = sys.argv[2]  # pre | injit
rows, cols, blocks, b = build_block_band()
a = bell_from_bsr(BSR(indices=jnp.asarray(rows*NB+cols, INDEX_DTYPE),
                      blocks=jnp.asarray(blocks), n=NB*BSZ, bsz=BSZ))
plan = build_banded_plan(a, row_tile=rt)
print(f"W={plan.W} rt={plan.rt}", file=sys.stderr)
bj = jnp.asarray(b)

if mode == "pre":
    tiles = jax.jit(_densify_band_tiles, static_argnums=(2,))(a, plan, jnp.float32)
    tiles.block_until_ready()
    @jax.jit
    def chain(a, b, plan, tiles):
        def body(_, b):
            w = bell_spmm_pallas_banded(a, b, plan, tiles=tiles)
            return w / (jnp.max(jnp.abs(w)) + 1.0)
        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, b))
    args = (a, bj, plan, tiles)
else:
    @jax.jit
    def chain(a, b, plan):
        def body(_, b):
            w = bell_spmm_pallas_banded(a, b, plan)
            return w / (jnp.max(jnp.abs(w)) + 1.0)
        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, b))
    args = (a, bj, plan)

t0=time.perf_counter(); r=float(chain(*args))
print(f"compile+run {time.perf_counter()-t0:.1f}s r={r:.4f}", file=sys.stderr)
best = np.inf
for _ in range(3):
    t0=time.perf_counter(); float(chain(*args)); best=min(best, time.perf_counter()-t0)
t = best/K_CHAIN
bytes_moved = rows.size*(BSZ*BSZ*4+4+BSZ*K*4)+NB*BSZ*K*4
print(f"rt={rt} {mode}: {t*1e3:.2f} ms/iter  {bytes_moved/t/1e9:.1f} GB/s")
