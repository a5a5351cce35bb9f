"""Pytree-native vector algebra.

TPU-first design note: every container in this framework is a plain JAX
pytree (dicts / :class:`Vector`).  All reductions (``vdot``, ``norm``...)
are expressed as pure ``jnp`` ops so that, when leaves are sharded over a
``jax.sharding.Mesh``, XLA lowers them to on-device partial reductions plus
ICI collectives automatically — no bespoke communication code is needed.

Functional parity with the reference library's tree-math layer
(``nifty/re/tree_math/{vector,vector_math,forest_math}.py``), re-designed
rather than translated.
"""

from __future__ import annotations

import operator
from functools import partial, reduce
from typing import Any, Callable

import jax
import numpy as np
from jax import numpy as jnp
from jax import random
from jax.tree_util import (
    register_pytree_node_class,
    tree_leaves,
    tree_map,
    tree_reduce,
    tree_structure,
    tree_unflatten,
)

__all__ = [
    "ShapeWithDtype",
    "Vector",
    "assert_arithmetics",
    "conj",
    "dot",
    "full_like",
    "get_map",
    "has_arithmetics",
    "map_forest",
    "map_forest_mean",
    "mean",
    "mean_and_std",
    "norm",
    "ones_like",
    "random_like",
    "result_type",
    "shape_dtype_struct",
    "size",
    "stack",
    "sum_of",
    "tree_add",
    "tree_axpy",
    "tree_scale",
    "tree_sub",
    "unite",
    "unstack",
    "vdot",
    "where",
    "zeros_like",
]


class ShapeWithDtype:
    """Minimal abstract array: a shape and a dtype.

    Used to describe domains/targets of models without allocating memory.
    Mirrors the role of ``ShapeWithDtype`` in the reference
    (``nifty/re/tree_math/vector_math.py:21``).
    """

    __slots__ = ("_shape", "_dtype")

    def __init__(self, shape=(), dtype=None):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(int(s) for s in shape)
        self._shape = shape
        # Default to JAX's default float: f64 under `jax_enable_x64`, else f32
        # (the TPU-native choice).
        self._dtype = jnp.result_type(float) if dtype is None else dtype

    @classmethod
    def from_leave(cls, element):
        if not (hasattr(element, "shape") and hasattr(element, "dtype")):
            raise TypeError(f"cannot infer shape/dtype of {element!r}")
        return cls(jnp.shape(element), element.dtype)

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self._dtype

    @property
    def size(self):
        return int(np.prod(self._shape, dtype=np.int64)) if self._shape else 1

    @property
    def ndim(self):
        return len(self._shape)

    def __len__(self):
        if self.ndim == 0:
            raise TypeError("len() of unsized object")
        return self._shape[0]

    def __eq__(self, other):
        if not isinstance(other, ShapeWithDtype):
            return False
        return (self._shape, self._dtype) == (other._shape, other._dtype)

    def __hash__(self):
        return hash((self._shape, jnp.dtype(self._dtype).name))

    def __repr__(self):
        return f"ShapeWithDtype(shape={self._shape}, dtype={jnp.dtype(self._dtype).name})"


def shape_dtype_struct(tree):
    """Abstract pytree of :class:`ShapeWithDtype` mirroring `tree`."""
    return tree_map(ShapeWithDtype.from_leave, tree)


def _lbroadcast(op: Callable):
    """Lift a binary jnp op to pytrees, broadcasting non-pytree scalars."""

    def lifted(a, b):
        ta, tb = isinstance(a, Vector), isinstance(b, Vector)
        if ta and tb:
            return Vector(tree_map(op, a.tree, b.tree))
        if ta:
            return Vector(tree_map(lambda x: op(x, b), a.tree))
        if tb:
            return Vector(tree_map(lambda y: op(a, y), b.tree))
        raise TypeError("at least one operand must be a Vector")

    return lifted


@register_pytree_node_class
class Vector:
    """Wrap any pytree and equip it with elementwise arithmetic.

    Registered as a pytree itself so it passes transparently through
    ``jit``/``vmap``/``grad``.  Functional analogue of the reference's
    ``Vector`` (``nifty/re/tree_math/vector.py:79``) with an independent
    implementation.
    """

    def __init__(self, tree):
        self._tree = tree.tree if isinstance(tree, Vector) else tree

    @property
    def tree(self):
        return self._tree

    def tree_flatten(self):
        return ((self._tree,), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(children[0])

    # --- container protocol -------------------------------------------------
    def __getitem__(self, key):
        return self._tree[key]

    def __contains__(self, key):
        return key in self._tree

    def __iter__(self):
        return iter(self._tree)

    def __len__(self):
        return len(self._tree)

    def keys(self):
        return self._tree.keys()

    def values(self):
        return self._tree.values()

    def items(self):
        return self._tree.items()

    # --- arithmetic ---------------------------------------------------------
    def __neg__(self):
        return Vector(tree_map(operator.neg, self._tree))

    def __pos__(self):
        return self

    def __abs__(self):
        return Vector(tree_map(jnp.abs, self._tree))

    def conj(self):
        return Vector(tree_map(jnp.conj, self._tree))

    @property
    def real(self):
        return Vector(tree_map(jnp.real, self._tree))

    @property
    def imag(self):
        return Vector(tree_map(jnp.imag, self._tree))

    @property
    def size(self):
        return size(self._tree)

    @property
    def shape(self):
        return tree_map(jnp.shape, self._tree)

    @property
    def dtype(self):
        return result_type(self._tree)

    def ravel(self):
        leaves = tree_leaves(self._tree)
        return jnp.concatenate([jnp.ravel(x) for x in leaves]) if leaves else jnp.zeros((0,))

    def __matmul__(self, other):
        return dot(self, other)

    def __rmatmul__(self, other):
        return dot(other, self)

    def __repr__(self):
        return f"Vector({self._tree!r})"

    def __str__(self):
        return repr(self)

    def __hash__(self):
        return hash(tuple(tree_leaves(self._tree)))

    def __bool__(self):
        raise ValueError("the truth value of a Vector is ambiguous; use .any()/.all()")


def _def_binary(name, op, reflected=True):
    setattr(Vector, f"__{name}__", _lbroadcast(op))
    if reflected:
        setattr(Vector, f"__r{name}__", _lbroadcast(lambda a, b: op(b, a)))


_def_binary("add", operator.add)
_def_binary("sub", operator.sub)
_def_binary("mul", operator.mul)
_def_binary("truediv", operator.truediv)
_def_binary("floordiv", operator.floordiv)
_def_binary("pow", operator.pow)
_def_binary("mod", operator.mod)
_def_binary("and", operator.and_)
_def_binary("or", operator.or_)
_def_binary("xor", operator.xor)
_def_binary("lt", operator.lt, reflected=False)
_def_binary("le", operator.le, reflected=False)
_def_binary("gt", operator.gt, reflected=False)
_def_binary("ge", operator.ge, reflected=False)
_def_binary("eq", operator.eq, reflected=False)
_def_binary("ne", operator.ne, reflected=False)


# --- elementary tree ops ----------------------------------------------------


def tree_add(a, b):
    return tree_map(operator.add, a, b)


def tree_sub(a, b):
    return tree_map(operator.sub, a, b)


def tree_scale(alpha, a):
    return tree_map(lambda x: alpha * x, a)


def tree_axpy(alpha, x, y):
    """y + alpha * x, elementwise over the trees."""
    return tree_map(lambda xe, ye: ye + alpha * xe, x, y)


def conj(a):
    return tree_map(jnp.conj, a)


def where(cond, x, y):
    """Elementwise select; `cond` may be a scalar/bool or a matching tree."""
    if isinstance(cond, Vector) or tree_structure(cond) == tree_structure(x):
        return tree_map(jnp.where, cond, x, y)
    return tree_map(lambda xe, ye: jnp.where(cond, xe, ye), x, y)


def size(tree) -> int:
    return sum(
        (e.size if hasattr(e, "size") else np.size(e)) for e in tree_leaves(tree)
    )


def result_type(tree):
    leaves = tree_leaves(tree)
    dtypes = [getattr(e, "dtype", np.result_type(e)) for e in leaves]
    return jnp.result_type(*dtypes) if dtypes else jnp.result_type(float)


Vector.ndim = property(lambda self: tree_map(jnp.ndim, self._tree))


def _leaf_vdot(a, b):
    return jnp.vdot(a, b, precision=jax.lax.Precision.HIGHEST)


def vdot(a, b):
    """Tree-wide inner product ⟨a, b⟩ = Σ_leaves vdot(a_i, b_i).

    Uses highest-precision dot products so CG recurrences remain accurate in
    float32 on TPU.
    """
    return tree_reduce(operator.add, tree_map(_leaf_vdot, a, b), 0.0)


def dot(a, b):
    """Tree-wide dot product without conjugation of the first argument."""
    prod = tree_map(
        lambda x, y: jnp.dot(
            jnp.ravel(x), jnp.ravel(y), precision=jax.lax.Precision.HIGHEST
        ),
        a,
        b,
    )
    return tree_reduce(operator.add, prod, 0.0)


def norm(tree, ord=2, *, ravel=False):
    """Tree-wide p-norm.

    Computes ``||concat(ravel(leaves))||_ord`` — identical semantics to
    flattening the whole tree into one vector first.
    """
    del ravel
    if ord == np.inf:
        red = tree_map(lambda x: jnp.max(jnp.abs(x)), tree)
        return tree_reduce(jnp.maximum, red, 0.0)
    red = tree_map(lambda x: jnp.sum(jnp.abs(x) ** ord), tree)
    return tree_reduce(operator.add, red, 0.0) ** (1.0 / ord)


def _like(tree, fill):
    def mk(e):
        if isinstance(e, ShapeWithDtype) or not hasattr(e, "shape"):
            e = e if isinstance(e, ShapeWithDtype) else ShapeWithDtype.from_leave(jnp.asarray(e))
            return jnp.full(e.shape, fill, dtype=e.dtype)
        return jnp.full(jnp.shape(e), fill, dtype=e.dtype)

    return tree_map(mk, tree)


def zeros_like(tree):
    return _like(tree, 0)


def ones_like(tree):
    return _like(tree, 1)


def full_like(tree, fill_value):
    return _like(tree, fill_value)


def random_like(key, primals, rng: Callable = random.normal):
    """Draw `rng` samples shaped like `primals`, splitting `key` per leaf.

    Mirrors the reference's keyed-split semantics
    (``nifty/re/tree_math/forest_math.py:60``): one subkey per leaf in
    flattening order, so results are invariant to jit/sharding.
    """
    struct = tree_structure(primals)
    subkeys = tree_unflatten(struct, list(random.split(key, struct.num_leaves)))

    def draw(k, p):
        shp = p.shape if hasattr(p, "shape") else jnp.shape(p)
        dtp = p.dtype if hasattr(p, "dtype") else jnp.result_type(p)
        return rng(key=k, shape=shp, dtype=dtp)

    return tree_map(draw, subkeys, primals)


def has_arithmetics(tree) -> bool:
    return all(
        isinstance(e, (jax.Array, np.ndarray, float, int, complex))
        or np.isscalar(e)
        for e in tree_leaves(tree)
    )


def assert_arithmetics(tree):
    if not has_arithmetics(tree):
        bad = [
            e
            for e in tree_leaves(tree)
            if not (isinstance(e, (jax.Array, np.ndarray, float, int, complex)) or np.isscalar(e))
        ]
        raise TypeError(f"tree contains non-arithmetic leaves: {bad!r}")


def unite(a, b, op=operator.add):
    """Union of two dict-like trees, combining shared keys with `op`."""
    a_t = a.tree if isinstance(a, Vector) else a
    b_t = b.tree if isinstance(b, Vector) else b
    out = {}
    for k in set(a_t) | set(b_t):
        if k in a_t and k in b_t:
            out[k] = op(a_t[k], b_t[k])
        else:
            out[k] = a_t[k] if k in a_t else b_t[k]
    return Vector(out) if isinstance(a, Vector) or isinstance(b, Vector) else out


def sum_of(trees):
    return reduce(tree_add, trees)


# --- forest (batched-tree) helpers ------------------------------------------


def stack(trees):
    """Stack a sequence of equal-structure trees along a new leading axis."""
    return tree_map(lambda *xs: jnp.stack(xs), *trees)


def unstack(tree):
    """Inverse of :func:`stack`: split the leading axis into a tuple."""
    leaves = tree_leaves(tree)
    if not leaves:
        return ()
    n = jnp.shape(leaves[0])[0]
    return tuple(tree_map(lambda x, _i=i: x[_i], tree) for i in range(n))


def mean(forest):
    """Mean over a sequence of trees or over the leading axis of one tree."""
    if isinstance(forest, (list, tuple)):
        n = len(forest)
        return tree_scale(1.0 / n, sum_of(forest))
    return tree_map(partial(jnp.mean, axis=0), forest)


def mean_and_std(forest, correct_bias=True):
    if isinstance(forest, (list, tuple)):
        forest = stack(forest)
    m = tree_map(partial(jnp.mean, axis=0), forest)
    s = tree_map(partial(jnp.std, axis=0, ddof=1 if correct_bias else 0), forest)
    return m, s


# --- maps -------------------------------------------------------------------


def smap(fun, in_axes=0, out_axes=0):
    """Sequential map with vmap semantics, implemented via `lax.scan`.

    Processes the mapped axis one slice at a time — O(1) extra memory
    compared to `vmap`'s O(n).  The TPU analogue of the reference's `smap`
    (``nifty/re/custom_map.py:106``).
    """
    if out_axes != 0:
        raise NotImplementedError("smap only supports out_axes=0")
    in_axes_t = in_axes if isinstance(in_axes, tuple) else (in_axes,)

    def mapped(*args):
        if len(in_axes_t) != len(args):
            ia = in_axes_t + (in_axes_t[-1],) * (len(args) - len(in_axes_t))
        else:
            ia = in_axes_t
        mapped_args = [a for a, ax in zip(args, ia) if ax is not None]
        static_args = [(i, a) for i, (a, ax) in enumerate(zip(args, ia)) if ax is None]
        map_idx = [i for i, ax in enumerate(ia) if ax is not None]
        for a, ax in zip(args, ia):
            if ax not in (0, None):
                raise NotImplementedError("smap only supports in_axes of 0/None")

        def body(carry, xs):
            full = list(xs)
            rebuilt = [None] * len(args)
            for i, a in static_args:
                rebuilt[i] = a
            for i, x in zip(map_idx, full):
                rebuilt[i] = x
            return carry, fun(*rebuilt)

        _, ys = jax.lax.scan(body, None, tuple(mapped_args))
        return ys

    return mapped


def lmap(fun, in_axes=0, out_axes=0):
    """Python-loop map with vmap semantics (unrolled, no batching rule needed)."""
    if out_axes != 0:
        raise NotImplementedError("lmap only supports out_axes=0")
    in_axes_t = in_axes if isinstance(in_axes, tuple) else (in_axes,)

    def mapped(*args):
        ia = in_axes_t + (in_axes_t[-1],) * (len(args) - len(in_axes_t))
        lengths = {
            jnp.shape(tree_leaves(a)[0])[0]
            for a, ax in zip(args, ia)
            if ax is not None
        }
        if len(lengths) != 1:
            raise ValueError(f"inconsistent mapped lengths {lengths}")
        (n,) = lengths
        outs = []
        for i in range(n):
            call_args = [
                a if ax is None else tree_map(lambda x: x[i], a)
                for a, ax in zip(args, ia)
            ]
            outs.append(fun(*call_args))
        return tree_map(lambda *xs: jnp.stack(xs), *outs)

    return mapped


_MAPS = {"vmap": jax.vmap, "pmap": jax.pmap}


def get_map(map_spec):
    """Resolve a map specification ("vmap"/"smap"/"lmap"/"pmap" or callable)."""
    if callable(map_spec):
        return map_spec
    if isinstance(map_spec, str):
        s = map_spec.lower()
        if s in _MAPS:
            return _MAPS[s]
        if s == "smap":
            return smap
        if s == "lmap":
            return lmap
    raise ValueError(f"unknown map {map_spec!r}")


def map_forest(fun, map="vmap", in_axes=0, **kwargs):
    return get_map(map)(fun, in_axes=in_axes, **kwargs)


def map_forest_mean(fun, map="vmap", in_axes=0, **kwargs):
    mapped = map_forest(fun, map=map, in_axes=in_axes, **kwargs)

    def meaned(*a, **kw):
        return mean(mapped(*a, **kw))

    return meaned
