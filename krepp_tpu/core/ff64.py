"""Float-float (double-float) primitives for f64 data movement on TPU.

The TPU X64 rewriter stores f64 as a float-float pair (hi = f32-rounded
value, lo = exact residual, |lo| <= ulp(hi)/2) and emulates every f64 op in
double-float arithmetic. That is fine for math, but *data movement* ops —
scatters, segment reductions — get emulated element-by-element and run an
order of magnitude slower than their native-f32 twins. Splitting the value
into its (hi, lo) halves, moving each with a native f32 op, and re-adding
is EXACT on TPU: hi + lo is the stored representation itself.

CPU keeps the plain f64 ops (true IEEE doubles would lose bits under the
split).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F = jnp.float64


def ff_split(x):
    """f64 -> (hi, lo) f32 pair with x == widen(hi) + widen(lo) exactly on
    TPU (it IS the stored representation)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(F)).astype(jnp.float32)
    return hi, lo


def scatter_set_f64(init, idx, val, guard_fill: bool = True):
    """init.at[idx].set(val, mode="drop") for f64 values via two native f32
    scatters (plus a written-mask pass when init is not all-zeros).

    init: [N] f64 array (any fill); idx: [K] int32 (>= N drops);
    val: [K] f64. guard_fill=False skips the written-mask when the caller
    knows init is identically zero (two scatters total)."""
    if jax.default_backend() == "cpu":
        return init.at[idx].set(val, mode="drop")
    N = init.shape[0]
    v_hi, v_lo = ff_split(val)
    hi = jnp.zeros((N,), jnp.float32).at[idx].set(v_hi, mode="drop")
    lo = jnp.zeros((N,), jnp.float32).at[idx].set(v_lo, mode="drop")
    out = hi.astype(F) + lo.astype(F)
    if not guard_fill:
        return out
    written = jnp.zeros((N,), bool).at[idx].set(True, mode="drop")
    return jnp.where(written, out, init)
