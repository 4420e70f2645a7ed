"""TPU-fast table lookup / scatter primitives.

TPUs have no hardware gather/scatter: XLA lowers per-lane dynamic indexing to
~0.5 ms serialized loops at 64k lanes (measured on v5e), while a one-hot
matmul runs on the MXU in ~10 us.  Every in-loop table access in the
propagation engine therefore goes through these helpers:

  * onehot_gather     -- table rows by per-lane index via one-hot @ table
  * masked_set        -- scatter-free .at[arange, idx].set via iota compare
  * interp_onehot     -- jnp.interp without its internal gathers
  * compact_scatter_add -- top_k-compacted histogram deposition: the only
    real scatter left, shrunk from N updates to the hit count
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def onehot_gather(table, idx, dtype=jnp.float32):
    """table[idx] for per-lane idx via one-hot matmul.

    table: (L,) or (L, F); idx: (N,) int32 in [0, L).  Returns (N,) or (N, F).
    Exact for values representable in f32 (use for f32 data and small ints).
    """
    squeeze = table.ndim == 1
    t = table[:, None] if squeeze else table
    oh = jax.nn.one_hot(idx, t.shape[0], dtype=dtype)
    out = _exact_select_dot(oh, t.astype(dtype))
    return out[:, 0] if squeeze else out


def _exact_select_dot(oh, t):
    """oh @ t exact to f32 for a one-hot matrix.

    The TPU MXU computes f32 matmuls with bfloat16 inputs by default, which
    would round every looked-up value (incl. DOM positions) to 8 mantissa
    bits; Precision.HIGHEST stalls this environment's remote compiler.
    Instead split the table into three bf16-exact summands (hi + mid + lo
    reconstructs f32 to ~2^-24): each partial product is then exact on the
    MXU and a one-hot row sums a single term, so the result is the exact
    f32 table row at 3x (still negligible) matmul cost."""
    hi = t.astype(jnp.bfloat16).astype(jnp.float32)
    rem = t - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    lo = rem - mid
    d = lambda m: jnp.dot(oh, m, preferred_element_type=jnp.float32)
    return d(hi) + d(mid) + d(lo)


def onehot_gather_exact(table, idx):
    """Bit-exact table[idx] via byte-split int8 matmuls.

    The MXU on this backend rounds even f32 matmul *outputs* to bfloat16, so
    float one-hot selection carries only ~0.4% relative precision.  int8 x
    int8 -> int32 products are exact: split each f32 into 4 bytes, select
    with 4x-wide int8 one-hot matmul, reassemble bitwise.  ~4x the cost of
    the float path -- use for small feature tables that need full precision
    (per-string geometry); use onehot_gather for tolerance-friendly data.
    """
    squeeze = table.ndim == 1
    t = table[:, None] if squeeze else table
    tb = jax.lax.bitcast_convert_type(t.astype(jnp.float32), jnp.uint32)
    by = jnp.stack([((tb >> (8 * i)) & 0xFF).astype(jnp.int32) - 128
                    for i in range(4)], axis=-1)
    b8 = by.reshape(t.shape[0], -1).astype(jnp.int8)
    oh = jax.nn.one_hot(idx, t.shape[0], dtype=jnp.int8)
    out = jnp.dot(oh, b8, preferred_element_type=jnp.int32)
    out = out.reshape(idx.shape[0], -1, 4) + 128
    u = (out[..., 0].astype(jnp.uint32)
         | (out[..., 1].astype(jnp.uint32) << 8)
         | (out[..., 2].astype(jnp.uint32) << 16)
         | (out[..., 3].astype(jnp.uint32) << 24))
    res = jax.lax.bitcast_convert_type(u, jnp.float32)
    return res[:, 0] if squeeze else res


def select_rows_exact(table, idx):
    """Bit-exact table[idx] via a masked select-reduce on the VPU.

    For small tables (S <= ~100, few features): one fused (N, S) comparison
    pass; exact f32 with no matmul involved (this backend's MXU rounds float
    matmul outputs to bfloat16, and its int8 path compiles pathologically
    slowly).  Cost ~ O(N*S) vector ops, amortized across features by fusion.
    """
    squeeze = table.ndim == 1
    t = table[:, None] if squeeze else table
    S, F = t.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], S), 1)
    mask = cols == idx[:, None]
    outs = [jnp.sum(jnp.where(mask, t[None, :, f], 0.0), axis=1)
            for f in range(F)]
    out = jnp.stack(outs, axis=1)
    return out[:, 0] if squeeze else out


def masked_set(arr, idx, value):
    """arr.at[arange(N), idx].set(value) without a scatter: iota compare.
    arr: (N, S); idx: (N,); value scalar or (N,)."""
    S = arr.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    mask = cols == idx[:, None]
    v = jnp.broadcast_to(jnp.asarray(value, arr.dtype), arr.shape)
    return jnp.where(mask, v, arr)


def ring_write(ring, pos, value, mask):
    """ring.at[arange(N), pos].set(value) where mask, scatter-free.
    ring: (N, K); pos: (N,); value: (N,); mask: (N,) bool."""
    K = ring.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, ring.shape, 1)
    sel = (cols == pos[:, None]) & mask[:, None]
    return jnp.where(sel, value[:, None], ring)


def interp_onehot(x, xp, fp):
    """jnp.interp(x, xp, fp) for uniform-or-not ascending xp without gathers.
    xp, fp: (L,); x: (N,).  Clamps outside the range like jnp.interp."""
    L = xp.shape[0]
    k = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, L - 2)
    # fetch (xp[k], xp[k+1], fp[k], fp[k+1]) in one matmul
    tab = jnp.stack([xp[:-1], xp[1:], fp[:-1], fp[1:]], axis=1)  # (L-1, 4)
    rows = onehot_gather(tab, k)
    x0, x1, f0, f1 = rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]
    t = jnp.clip((x - x0) / jnp.maximum(x1 - x0, 1e-30), 0.0, 1.0)
    return f0 + t * (f1 - f0)


def shifted_window_table(values, k_radius):
    """(L, 2K+1) matrix W with W[l, K+d] = values[clip(l+d)] for d in [-K, K].
    Built once per jitted call (tiny); lets a single one-hot matmul fetch a
    photon's whole layer neighborhood."""
    L = values.shape[0]
    offs = jnp.arange(-k_radius, k_radius + 1)
    idx = jnp.clip(jnp.arange(L)[:, None] + offs[None, :], 0, L - 1)
    return values[idx]


def directional_window_table(values, k_radius):
    """(L+K, K+1) matrix W with W[c, k] = values[clip(c - K + k)]: column
    c holds the ASCENDING (K+1)-layer band starting at base layer c - K.

    A walk that visits at most K+1 layers in ONE direction only needs this
    half-window: one-hot column j0+K for an upward photon (band j0..j0+K)
    or j0 for a downward one (band j0-K..j0, reversed in visit order by a
    static row reindex).  Half the fetched rows of the symmetric 2K+1
    window -- the walk fetch is the kernel's largest single MXU cost."""
    L = values.shape[0]
    base = jnp.arange(L + k_radius) - k_radius
    idx = jnp.clip(base[:, None] + jnp.arange(k_radius + 1)[None, :],
                   0, L - 1)
    return values[idx]


def compact_scatter_add(target, flat_idx, weights, capacity,
                        fallback_full=True):
    """target.at[flat_idx].add(weights) where most weights are zero.

    Compacts the nonzero entries with top_k (capacity H) and scatters only
    those H updates.  If more than H lanes are nonzero and fallback_full is
    set, falls back to the full scatter inside a lax.cond (slow but exact,
    and only the taken branch executes on TPU).
    """
    n = weights.shape[0]
    if capacity <= 0 or capacity >= n:
        return target.at[flat_idx].add(weights, mode="drop")

    n_nonzero = jnp.sum((weights != 0.0).astype(jnp.int32))

    def compacted(t):
        w_top, lanes = jax.lax.top_k(weights, capacity)
        idx_top = flat_idx[lanes]
        return t.at[idx_top].add(w_top, mode="drop")

    def full(t):
        return t.at[flat_idx].add(weights, mode="drop")

    if fallback_full:
        return jax.lax.cond(n_nonzero <= capacity, compacted, full, target)
    return compacted(target)
