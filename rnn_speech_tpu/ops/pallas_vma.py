"""shard_map-aware ``pallas_call``: vma-typed out_shapes.

Under ``jax.shard_map(..., check_vma=True)`` (the default) every
``pallas_call`` must declare which mesh axes its outputs vary over —
``jax.ShapeDtypeStruct`` grew a ``vma`` field for this.  Our kernels are
deliberately mesh-agnostic (shard_map hands them local arrays; no
partitioning rules needed — DESIGN.md "Parallelism"), so the correct and
sound declaration is computable at call time: a kernel's outputs vary
over exactly the union of its inputs' varying axes (a Pallas kernel is a
local computation; it cannot UN-vary an axis — only collectives do that).

``pallas_call`` here wraps ``pl.pallas_call`` with that one change and is
a drop-in replacement: outside shard_map the union is empty and the
structs pass through untouched; on jax versions without vma the fallback
is the plain struct.
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl


def _vma_union(args) -> frozenset:
    vma: frozenset = frozenset()
    for leaf in jax.tree_util.tree_leaves(args):
        try:
            vma = vma | jax.typeof(leaf).vma
        except Exception:       # old jax: no vma typing anywhere
            return frozenset()
    return vma


def _with_vma(struct: jax.ShapeDtypeStruct, vma: frozenset):
    try:
        return jax.ShapeDtypeStruct(struct.shape, struct.dtype, vma=vma)
    except TypeError:           # old jax: ShapeDtypeStruct has no vma
        return struct


def pallas_call(kernel, *, out_shape, **kwargs):
    """``pl.pallas_call`` whose out_shape vma is derived from the inputs
    at call time.  Same calling convention: returns a function of the
    kernel's inputs."""

    def call(*args):
        vma = _vma_union(args)
        shapes = out_shape
        if vma:
            shapes = jax.tree_util.tree_map(
                lambda s: _with_vma(s, vma),
                out_shape,
                is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
            )
        return pl.pallas_call(kernel, out_shape=shapes, **kwargs)(*args)

    return call
