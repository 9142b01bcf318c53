"""Small helper to declare frozen dataclasses that are JAX pytrees.

Array-valued fields become pytree leaves (traced through jit/vmap/scan);
fields listed in ``meta`` are static auxiliary data that participate in
jit cache keys.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta: tuple = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Parameters
    ----------
    meta:
        Names of fields that are static (hashable) metadata rather than
        array data.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        names = [f.name for f in dataclasses.fields(c)]
        data_fields = [n for n in names if n not in meta]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta)
        )
        return c

    return wrap(cls) if cls is not None else wrap
