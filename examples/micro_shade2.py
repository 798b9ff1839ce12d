"""Microbench: shade-row fetch + consume alternatives at R=262144 (dev tool).

The profiled chain (one (R,21) row gather -> column slices -> weighted
normal + material fields) costs ~1.0 ms/bounce, over half of it layout
fixups (slice_reduce_fusion + transpose copy).  Variants:
  a) shipped: (R,21) gather, slice columns
  b) transposed-output gather via lax.gather: (21,R), slice rows
  c) (R,10) normals gather + one-hot material matmul (M=2 materials)
  d) 21 separate 1D gathers (per-index-cost check)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.utils.compcache import enable_compilation_cache

enable_compilation_cache()

R = 262144
N = 2048
M = 2

k = jax.random.PRNGKey(0)
shade_mat = jax.random.normal(k, (N, 21), jnp.float32)
mat_rows = jax.random.normal(jax.random.PRNGKey(9), (M, 12), jnp.float32)
tri_shade10 = jax.random.normal(jax.random.PRNGKey(8), (N, 10), jnp.float32)
# sorted-ish indices like the real fused loop sees
import os as _os
SORTED = _os.environ.get("SORTED", "1") == "1"
idx = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, N).astype(jnp.int32)
if SORTED: idx = jnp.sort(idx)
mat_idx = jnp.sort(jax.random.randint(jax.random.PRNGKey(2), (R,), 0, M)).astype(jnp.int32)
u = jax.random.uniform(jax.random.PRNGKey(3), (R,))
v = jax.random.uniform(jax.random.PRNGKey(4), (R,))


def consume(n0, n1, n2, mat, u, v):
    """normal interp + normalize + a material-driven result (mimics
    bounce_shade's consumption shape)."""
    w = 1.0 - u - v
    nrm = n0 * w[:, None] + n1 * u[:, None] + n2 * v[:, None]
    nn = nrm / jnp.sqrt(jnp.sum(nrm * nrm, axis=1, keepdims=True))
    out = nn * mat["roughness"][:, None] + mat["color"] * mat["metalness"][:, None]
    return out + mat["specular_color"] * mat["emission_strength"][:, None]


def variant_a(idx, mat_idx, u, v):
    g = shade_mat[idx]
    mat = {"color": g[:, 9:12], "specular_color": g[:, 12:15],
           "roughness": g[:, 18], "metalness": g[:, 19],
           "emission_strength": g[:, 20]}
    return consume(g[:, 0:3], g[:, 3:6], g[:, 6:9], mat, u, v)


def variant_b(idx, mat_idx, u, v):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,),
    )
    g = jax.lax.gather(
        shade_mat.T.reshape(21, N).T if False else shade_mat,
        idx[:, None], dn, slice_sizes=(1, 21),
    )  # -> (21, R)? offset dim 0 carries the 21-slice
    mat = {"color": g[9:12].T, "specular_color": g[12:15].T,
           "roughness": g[18], "metalness": g[19],
           "emission_strength": g[20]}
    return consume(g[0:3].T, g[3:6].T, g[6:9].T, mat, u, v)


def variant_c(idx, mat_idx, u, v):
    g = tri_shade10[idx]  # (R, 10) normals + material-bits column
    oh = jax.nn.one_hot(mat_idx, M, dtype=jnp.float32)  # (R, M)
    row = oh @ mat_rows  # (R, 12)
    mat = {"color": row[:, 0:3], "specular_color": row[:, 3:6],
           "roughness": row[:, 9], "metalness": row[:, 10],
           "emission_strength": row[:, 11]}
    return consume(g[:, 0:3], g[:, 3:6], g[:, 6:9], mat, u, v)


def variant_d(idx, mat_idx, u, v):
    cols = [shade_mat[:, j][idx] for j in range(21)]
    mat = {"color": jnp.stack(cols[9:12], 1),
           "specular_color": jnp.stack(cols[12:15], 1),
           "roughness": cols[18], "metalness": cols[19],
           "emission_strength": cols[20]}
    n0 = jnp.stack(cols[0:3], 1)
    n1 = jnp.stack(cols[3:6], 1)
    n2 = jnp.stack(cols[6:9], 1)
    return consume(n0, n1, n2, mat, u, v)


def slope(f, n1=50, n2=100):
    @jax.jit
    def run(n):
        def body(i, acc):
            idx_i = (idx + i) % N  # defeat loop-invariant hoisting
            mi = (mat_idx + i) % M
            out = f(idx_i, mi, u + acc * 1e-30, v)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    np.asarray(run(n1)); np.asarray(run(n2))
    ts = []
    for n in (n1, n2, n1, n2, n1, n2):
        t0 = time.perf_counter()
        np.asarray(run(n))
        ts.append(time.perf_counter() - t0)
    return (min(ts[1::2]) - min(ts[0::2])) / (n2 - n1)


for name, fn in [("a: (R,21) gather + col slices", variant_a),
                 ("b: lax.gather -> (21,R) rows", variant_b),
                 ("c: (R,10) gather + one-hot mat", variant_c),
                 ("d: 21 separate 1D gathers", variant_d)]:
    try:
        np.asarray(fn(idx, mat_idx, u, v))
        print(f"{name:34s} {slope(fn)*1e3:7.3f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:100]}", flush=True)
