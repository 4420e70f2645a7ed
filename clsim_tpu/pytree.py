"""Pytree registration helper for NamedTuples with static (non-array) fields.

JAX treats plain NamedTuples as pytrees with every field a leaf; fields like
``enabled: bool`` or ``kind: str`` must instead be compile-time constants
(they select code paths).  register_static_fields() re-registers a NamedTuple
class so the named fields travel in aux_data and specialize jit compilation,
mirroring how the reference bakes such options into generated OpenCL source
via #defines."""

from __future__ import annotations

import jax


def register_static_fields(cls, static_fields):
    static_fields = tuple(static_fields)
    dynamic_fields = tuple(f for f in cls._fields if f not in static_fields)

    def flatten(obj):
        children = tuple(getattr(obj, f) for f in dynamic_fields)
        aux = tuple(getattr(obj, f) for f in static_fields)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(dynamic_fields, children))
        kwargs.update(zip(static_fields, aux))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls
