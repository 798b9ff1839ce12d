"""Microbench: per-bounce ray-state reorder alternatives at R=262144 (dev tool).

Times, via the fori-slope method (fixed latency cancels):
  a) the shipped _sort_ray_state (two 8-operand lax.sort calls)
  b) one (key, iota) sort + packed-row gather permute
  c) argsort + individual column gathers
  d) single 14-operand sort
  e) key sort only (floor)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.ops.trace import _sort_ray_state
from tpu_pathtracer.utils.compcache import enable_compilation_cache

enable_compilation_cache()

R = 262144
key0 = jax.random.randint(jax.random.PRNGKey(0), (R,), 0, 2700 * 8).astype(jnp.int32)
ro = jax.random.normal(jax.random.PRNGKey(1), (R, 3), jnp.float32)
rd = jax.random.normal(jax.random.PRNGKey(2), (R, 3), jnp.float32)
color = jax.random.normal(jax.random.PRNGKey(3), (R, 3), jnp.float32)
inc = jax.random.normal(jax.random.PRNGKey(4), (R, 3), jnp.float32)
seed = jax.random.randint(jax.random.PRNGKey(5), (R,), 0, 1 << 30).astype(jnp.uint32)
pixact = jax.random.randint(jax.random.PRNGKey(6), (R,), 0, 1 << 30).astype(jnp.int32)


def slope(f, n1=20, n2=40):
    @jax.jit
    def run(n, *args):
        def body(i, c):
            out = f(*c)
            # fold the iteration index in so the loop cannot be collapsed
            return tuple(o if o.dtype != jnp.int32 else o ^ i for o in out)
        return jax.lax.fori_loop(0, n, body, args)

    args = (key0, ro, rd, color, inc, seed, pixact)
    np.asarray(jax.tree.leaves(run(n1, *args))[0])
    np.asarray(jax.tree.leaves(run(n2, *args))[0])
    ts = []
    for n in (n1, n2, n1, n2, n1, n2):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(run(n, *args))[0])
        ts.append(time.perf_counter() - t0)
    t1 = min(ts[0::2])
    t2 = min(ts[1::2])
    return (t2 - t1) / (n2 - n1)


def variant_a(key, ro, rd, color, inc, seed, pixact):
    # shipped path (component-major (3, R) state since round 4)
    ro_t, rd_t, c_t, i_t, seed, pixact = _sort_ray_state(
        key, ro.T, rd.T, color.T, inc.T, seed, pixact
    )
    return (key, ro_t.T, rd_t.T, c_t.T, i_t.T, seed, pixact)


def variant_b(key, ro, rd, color, inc, seed, pixact):
    iota = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
    _, perm = jax.lax.sort((key, iota), dimension=0, num_keys=1)
    rows = jnp.concatenate(
        [ro, rd, color, inc,
         jax.lax.bitcast_convert_type(seed, jnp.float32)[:, None],
         jax.lax.bitcast_convert_type(pixact, jnp.float32)[:, None],
         jnp.zeros((R, 2), jnp.float32)],
        axis=1,
    )  # (R, 16)
    rows = rows[perm]
    return (key, rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12],
            jax.lax.bitcast_convert_type(rows[:, 12], jnp.uint32),
            jax.lax.bitcast_convert_type(rows[:, 13], jnp.int32))


def variant_c(key, ro, rd, color, inc, seed, pixact):
    iota = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
    _, perm = jax.lax.sort((key, iota), dimension=0, num_keys=1)
    return (key, ro[perm], rd[perm], color[perm], inc[perm], seed[perm],
            pixact[perm])


def variant_d(key, ro, rd, color, inc, seed, pixact):
    seed_i = jax.lax.bitcast_convert_type(seed, jnp.int32)
    out = jax.lax.sort(
        (key, ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
         color[:, 0], color[:, 1], color[:, 2], inc[:, 0], inc[:, 1],
         inc[:, 2], seed_i, pixact),
        dimension=0, num_keys=1,
    )
    return (key, jnp.stack(out[1:4], 1), jnp.stack(out[4:7], 1),
            jnp.stack(out[7:10], 1), jnp.stack(out[10:13], 1),
            jax.lax.bitcast_convert_type(out[13], jnp.uint32), out[14])


def variant_e(key, ro, rd, color, inc, seed, pixact):
    (key2,) = jax.lax.sort((key,), dimension=0, num_keys=1)
    return (key2, ro, rd, color, inc, seed, pixact)


def variant_f(key, ro, rd, color, inc, seed, pixact):
    """Two 8-op sorts with an optimization_barrier between them so XLA
    cannot merge them into one 15-operand sort (the merged sort falls off
    the >8-operand cliff)."""
    seed_i = jax.lax.bitcast_convert_type(seed, jnp.int32)
    _, ro0, ro1, ro2, rd0, rd1, rd2, seed_i = jax.lax.sort(
        (key, ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
         seed_i),
        dimension=0, num_keys=1,
    )
    key2 = jax.lax.optimization_barrier(key)
    _, c0, c1, c2, i0, i1, i2, pixact = jax.lax.sort(
        (key2, color[:, 0], color[:, 1], color[:, 2], inc[:, 0],
         inc[:, 1], inc[:, 2], pixact),
        dimension=0, num_keys=1,
    )
    return (key, jnp.stack([ro0, ro1, ro2], 1), jnp.stack([rd0, rd1, rd2], 1),
            jnp.stack([c0, c1, c2], 1), jnp.stack([i0, i1, i2], 1),
            jax.lax.bitcast_convert_type(seed_i, jnp.uint32), pixact)


def variant_g(key, ro, rd, color, inc, seed, pixact):
    """Three barrier-separated 5-op sorts (smaller operand sets)."""
    seed_i = jax.lax.bitcast_convert_type(seed, jnp.int32)
    _, ro0, ro1, ro2, seed_i = jax.lax.sort(
        (key, ro[:, 0], ro[:, 1], ro[:, 2], seed_i), dimension=0, num_keys=1)
    key2 = jax.lax.optimization_barrier(key)
    _, rd0, rd1, rd2, pixact = jax.lax.sort(
        (key2, rd[:, 0], rd[:, 1], rd[:, 2], pixact), dimension=0, num_keys=1)
    key3 = jax.lax.optimization_barrier(key2)
    _, c0, c1, c2, i0, i1, i2 = jax.lax.sort(
        (key3, color[:, 0], color[:, 1], color[:, 2], inc[:, 0], inc[:, 1],
         inc[:, 2]),
        dimension=0, num_keys=1,
    )
    return (key, jnp.stack([ro0, ro1, ro2], 1), jnp.stack([rd0, rd1, rd2], 1),
            jnp.stack([c0, c1, c2], 1), jnp.stack([i0, i1, i2], 1),
            jax.lax.bitcast_convert_type(seed_i, jnp.uint32), pixact)


def variant_h(key, ro, rd, color, inc, seed, pixact):
    """Keysort with packed f32x2->f64-view payload columns: halves the
    payload operand count (7 packed columns + key = one 8-op sort)."""
    def pack2(x, y):
        xi = jax.lax.bitcast_convert_type(x, jnp.uint32).astype(jnp.uint64)
        yi = jax.lax.bitcast_convert_type(y, jnp.uint32).astype(jnp.uint64)
        return jax.lax.bitcast_convert_type(xi | (yi << 32), jnp.float64)

    def unpack2(p):
        pi = jax.lax.bitcast_convert_type(p, jnp.uint64)
        x = jax.lax.bitcast_convert_type((pi & 0xFFFFFFFF).astype(jnp.uint32),
                                         jnp.float32)
        y = jax.lax.bitcast_convert_type((pi >> 32).astype(jnp.uint32),
                                         jnp.float32)
        return x, y

    seed_f = jax.lax.bitcast_convert_type(seed, jnp.float32)
    pix_f = jax.lax.bitcast_convert_type(pixact, jnp.float32)
    p0 = pack2(ro[:, 0], ro[:, 1])
    p1 = pack2(ro[:, 2], rd[:, 0])
    p2 = pack2(rd[:, 1], rd[:, 2])
    p3 = pack2(color[:, 0], color[:, 1])
    p4 = pack2(color[:, 2], inc[:, 0])
    p5 = pack2(inc[:, 1], inc[:, 2])
    p6 = pack2(seed_f, pix_f)
    _, p0, p1, p2, p3, p4, p5, p6 = jax.lax.sort(
        (key, p0, p1, p2, p3, p4, p5, p6), dimension=0, num_keys=1)
    ro0, ro1 = unpack2(p0)
    ro2, rd0 = unpack2(p1)
    rd1, rd2 = unpack2(p2)
    c0, c1 = unpack2(p3)
    c2, i0 = unpack2(p4)
    i1, i2 = unpack2(p5)
    seed_f, pix_f = unpack2(p6)
    return (key, jnp.stack([ro0, ro1, ro2], 1), jnp.stack([rd0, rd1, rd2], 1),
            jnp.stack([c0, c1, c2], 1), jnp.stack([i0, i1, i2], 1),
            jax.lax.bitcast_convert_type(seed_f, jnp.uint32),
            jax.lax.bitcast_convert_type(pix_f, jnp.int32))


for name, fn in [("a: 2x 8-op sort (shipped)", variant_a),
                 ("b: keysort + packed row gather", variant_b),
                 ("c: keysort + 6 col gathers", variant_c),
                 ("d: single 15-op sort", variant_d),
                 ("e: key-only sort (floor)", variant_e),
                 ("f: 2x 8-op sort + opt barrier", variant_f),
                 ("g: 3x 5-7-op sort + barriers", variant_g),
                 ("h: 8-op sort, f64-packed pairs", variant_h)]:
    try:
        print(f"{name:34s} {slope(fn)*1e3:7.3f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)
