"""Deterministic real-structure matrix fixtures (BASELINE.md config 2-4).

The environment has zero egress, so the SuiteSparse files named in
BASELINE.md (bcsstk*, webbase) cannot be downloaded.  These generators
assemble the same matrix *classes* from first principles instead of
sampling synthetic bands:

* ``poisson_fem``     — P1 (linear triangle) FEM stiffness of -Δu on an
  unstructured Delaunay mesh of a square with a hole: SPD, ~7 nnz/row,
  irregular row lengths — the bcsstk/FEM class.
* ``elasticity_fem``  — 2-D plane-stress linear elasticity on the same
  mesh, 2 dof/node: natural 2x2 block structure, the literal bcsstk
  construction (stiffness of a structure problem).
* ``powerlaw_graph``  — preferential-attachment adjacency: heavy-tailed
  degrees, no bandable structure — the webbase/graph class where
  locality-recovery must *fail gracefully*.

Node ids are scrambled by a random permutation before assembly: real
inputs arrive in whatever order the mesher/crawler emitted, so latent
locality is present but hidden (exactly what RCM must recover).

Fixtures are committed as ``benchmarks/matrices/*.mtx`` (small, parsed by
``sparse_tpu.io.matrix_market``); the suite regenerates LARGE instances
in-process for roofline-relevant rates (nothing big is committed).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _mesh(n_points: int, seed: int):
    """Delaunay triangulation of quasi-uniform points on [0,1]^2 minus a
    central hole (holes give FEM meshes their irregular connectivity)."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    pts = rng.random((int(n_points * 1.3), 2))
    hole = ((pts - 0.5) ** 2).sum(1) > 0.02  # r ~ 0.14 hole
    pts = pts[hole][:n_points]
    tri = Delaunay(pts)
    # drop slivers spanning the hole (circumradius filter keeps the mesh sane)
    t = tri.simplices
    p = pts[t]
    a = np.linalg.norm(p[:, 0] - p[:, 1], axis=1)
    b = np.linalg.norm(p[:, 1] - p[:, 2], axis=1)
    c = np.linalg.norm(p[:, 2] - p[:, 0], axis=1)
    s = (a + b + c) / 2
    area = np.sqrt(np.maximum(s * (s - a) * (s - b) * (s - c), 1e-300))
    keep = area / (a * b * c / 4) > 0.08  # inradius/circumradius-ish filter
    return pts, t[keep]


def _scramble(a: sp.csr_matrix, seed: int, block: int = 1) -> sp.csr_matrix:
    """Random symmetric permutation hiding the mesher's latent locality.

    ``block`` > 1 permutes *groups* of consecutive indices together — the
    realistic scramble for multi-dof problems: a mesher/assembler emits
    NODES in arbitrary order, but each node's dofs stay adjacent, so real
    elasticity matrices (bcsstk class) arrive with their 2x2 dof blocks
    intact even when node numbering is arbitrary.  (Round 3 scrambled at
    dof granularity, which destroyed the block structure no real input
    loses — and with it the block-dispatch story this fixture exists to
    exercise.)"""
    rng = np.random.default_rng(seed + 1000)
    nb = a.shape[0] // block
    p = (rng.permutation(nb)[:, None] * block
         + np.arange(block)[None, :]).reshape(-1)
    return a[p][:, p].tocsr()


def poisson_fem(n_points: int = 8_000, seed: int = 0,
                scramble: bool = True) -> sp.csr_matrix:
    """P1 stiffness matrix of -Δ on an unstructured mesh (SPD)."""
    pts, tris = _mesh(n_points, seed)
    n = pts.shape[0]
    # per-element gradients: for triangle (p0,p1,p2), grad of basis i is
    # perpendicular to the opposite edge / (2*area)
    p = pts[tris]  # (ne, 3, 2)
    e = p[:, [1, 2, 0]] - p[:, [2, 0, 1]]  # opposite edges (ne, 3, 2)
    area2 = np.abs(e[:, 0, 0] * e[:, 1, 1] - e[:, 0, 1] * e[:, 1, 0])
    grads = np.stack([-e[..., 1], e[..., 0]], axis=-1) / area2[:, None, None]
    ke = np.einsum("eik,ejk->eij", grads, grads) * (area2 / 2)[:, None, None]
    rows = np.repeat(tris, 3, axis=1).reshape(-1)
    cols = np.tile(tris, (1, 3)).reshape(-1)
    a = sp.coo_matrix((ke.reshape(-1), (rows, cols)), shape=(n, n)).tocsr()
    a.sum_duplicates()
    a = a + sp.eye(n, format="csr") * 1e-8  # pin the hole-boundary nullspace
    return _scramble(a, seed) if scramble else a


def elasticity_fem(n_points: int = 3_000, seed: int = 1,
                   scramble: bool = True) -> sp.csr_matrix:
    """2-D plane-stress elasticity stiffness, 2 dof/node (bcsstk class:
    2x2 block structure, SPD)."""
    pts, tris = _mesh(n_points, seed)
    n = pts.shape[0]
    E, nu = 1.0, 0.3
    c = E / (1 - nu * nu)
    D = np.array([[c, c * nu, 0], [c * nu, c, 0], [0, 0, c * (1 - nu) / 2]])
    p = pts[tris]
    e = p[:, [1, 2, 0]] - p[:, [2, 0, 1]]
    area2 = np.abs(e[:, 0, 0] * e[:, 1, 1] - e[:, 0, 1] * e[:, 1, 0])
    grads = np.stack([-e[..., 1], e[..., 0]], axis=-1) / area2[:, None, None]
    ne = tris.shape[0]
    B = np.zeros((ne, 3, 6))
    B[:, 0, 0::2] = grads[..., 0]
    B[:, 1, 1::2] = grads[..., 1]
    B[:, 2, 0::2] = grads[..., 1]
    B[:, 2, 1::2] = grads[..., 0]
    ke = np.einsum("eki,kl,elj->eij", B, D, B) * (area2 / 2)[:, None, None]
    dof = np.stack([2 * tris, 2 * tris + 1], axis=-1).reshape(ne, 6)
    rows = np.repeat(dof, 6, axis=1).reshape(-1)
    cols = np.tile(dof, (1, 6)).reshape(-1)
    a = sp.coo_matrix((ke.reshape(-1), (rows, cols)),
                      shape=(2 * n, 2 * n)).tocsr()
    a.sum_duplicates()
    a = a + sp.eye(2 * n, format="csr") * 1e-8
    # node-blockwise scramble: dof pairs travel together (see _scramble)
    return _scramble(a, seed, block=2) if scramble else a


def powerlaw_graph(n: int = 10_000, m: int = 8, seed: int = 2) -> sp.csr_matrix:
    """Preferential-attachment adjacency (heavy-tailed degrees, webbase
    class).  Each new node attaches to ``m`` targets drawn from the
    endpoint pool (degree-proportional)."""
    rng = np.random.default_rng(seed)
    src, dst, pool = [], [], list(range(m))
    for v in range(m, n):
        targets = np.unique(
            [pool[i] for i in rng.integers(0, len(pool), m)]
        )
        for t in targets:
            src.append(v)
            dst.append(int(t))
            pool.append(v)
            pool.append(int(t))
    src, dst = np.array(src), np.array(dst)
    w = rng.random(src.size) + 0.5
    a = sp.coo_matrix(
        (np.concatenate([w, w]),
         (np.concatenate([src, dst]), np.concatenate([dst, src]))),
        shape=(n, n),
    ).tocsr()
    a.sum_duplicates()
    return a


FIXTURES = {
    # name -> (builder, kwargs): committed small instances
    "fem_poisson_8k": (poisson_fem, dict(n_points=8_000, seed=0)),
    "fem_elasticity_6k": (elasticity_fem, dict(n_points=3_000, seed=1)),
    "graph_powerlaw_10k": (powerlaw_graph, dict(n=10_000, m=8, seed=2)),
}


def main():
    import pathlib

    import scipy.io as sio

    out = pathlib.Path(__file__).parent / "matrices"
    out.mkdir(exist_ok=True)
    for name, (fn, kw) in FIXTURES.items():
        a = fn(**kw)
        path = out / f"{name}.mtx"
        sio.mmwrite(
            str(path), a.tocoo(), comment=f"sparse_tpu fixture {name} "
            f"(deterministic, benchmarks/gen_fixtures.py)", precision=7,
        )
        print(f"{path}: n={a.shape[0]} nnz={a.nnz}")


if __name__ == "__main__":
    main()
