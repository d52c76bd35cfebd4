"""pack_jit: shape-cached jit for op entry points taking table-pack dicts.

The scheme layers (keygen, rlwe, encoders, decryptor) call the ops layer
EAGERLY — outside any enclosing jit — during client-side setup.  Eager JAX
dispatches every primitive as its own mini-executable, so a composite like a
wide NTT (log n stages x ~50 pair primitives) costs hundreds of XLA
compiles per first call (~3 s even at n=32).  Wrapping the entry point in
jax.jit collapses that to ONE compile, cached by input shape.

Plain jax.jit cannot be used directly because table packs mix device arrays
with python scalars that drive trace-time control flow ("words", the
"use_pallas*" backend flags): as pytree leaves they would become tracers and
`if t.get(...)` would raise.  pack_jit splits every dict argument into its
array leaves (dynamic) and everything else (static, must be hashable), and
specializes one jitted closure per static signature.  Non-dict, non-array
positional args (python ints like a negacyclic shift) are static too —
matching the current semantics where they are baked into the trace.

Inside an enclosing jit, the wrapper still works: array leaves are tracers,
jit-of-jit is inlined during lowering, and XLA fuses across the boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def safe_stack(parts, axis: int = 0):
    """jnp.stack that sidesteps an XLA:CPU concatenate-fusion pathology.

    On the CPU backend, a concatenate fused with its operands re-emits each
    operand's ENTIRE upstream expression per branch with no sharing across
    fusion operands; chained through the wide path's (hi, lo) pair
    re-assemblies this duplication compounds exponentially in chain depth
    (measured: 36 s vs 5 ms per BEHZ base conversion at n=32, and
    optimization_barrier does not survive the CPU pipeline).  Building the
    stacked array with dynamic-update-slice writes instead keeps each
    operand a separate fusion root.  TPU's emitter shares subexpressions
    fine, so the natural stack is kept there.
    """
    if jax.default_backend() != "cpu":
        return jnp.stack(parts, axis=axis)
    parts = [jnp.expand_dims(p, axis) for p in parts]
    ax = axis if axis >= 0 else parts[0].ndim + axis
    shape = list(parts[0].shape)
    shape[ax] = len(parts)
    out = jnp.zeros(tuple(shape), parts[0].dtype)
    for i, p in enumerate(parts):
        out = jax.lax.dynamic_update_slice_in_dim(out, p, i, axis=ax)
    return out


def _is_array(v) -> bool:
    return isinstance(v, (jax.Array, np.ndarray))


def pack_jit(fn):
    """Wrap fn so every call runs under jax.jit, with dict-argument
    non-array leaves (and bare python-scalar args) treated as static."""
    cache: dict = {}

    @functools.wraps(fn)
    def wrapper(*args):
        spec = []
        dyn = []
        for a in args:
            if isinstance(a, dict):
                arrs = {k: v for k, v in a.items() if _is_array(v)}
                stat = tuple(sorted(
                    (k, v) for k, v in a.items() if not _is_array(v)))
                spec.append(("dict", stat))
                dyn.append(arrs)
            elif _is_array(a):
                spec.append(("arr",))
                dyn.append(a)
            else:
                spec.append(("static", a))
        key = tuple(spec)
        jfn = cache.get(key)
        if jfn is None:
            def rebuild(dargs, _spec=key):
                full = []
                it = iter(dargs)
                for s in _spec:
                    if s[0] == "dict":
                        full.append({**dict(s[1]), **next(it)})
                    elif s[0] == "arr":
                        full.append(next(it))
                    else:
                        full.append(s[1])
                return fn(*full)

            jfn = cache[key] = jax.jit(rebuild)
        return jfn(tuple(dyn))

    wrapper.__wrapped__ = fn
    return wrapper
