"""Strings as static pytree leaves.

Lets names/identifiers ride through ``jit``-ed functions as compile-time
constants instead of tracers (reference analogue:
``nifty/re/tree_math/pytree_string.py:48``).
"""

from jax.tree_util import register_pytree_node, tree_map

__all__ = ["PyTreeString", "hide_strings"]


class PyTreeString:
    """A string registered as a pytree with zero children (pure aux data)."""

    __slots__ = ("_s",)

    def __init__(self, s):
        self._s = str(s)

    def __str__(self):
        return self._s

    def __repr__(self):
        return f"PyTreeString({self._s!r})"

    def __eq__(self, other):
        o = other._s if isinstance(other, PyTreeString) else other
        return self._s == o

    def __hash__(self):
        return hash(self._s)

    def __add__(self, other):
        o = other._s if isinstance(other, PyTreeString) else other
        return PyTreeString(self._s + o)

    def lower(self):
        return PyTreeString(self._s.lower())

    def upper(self):
        return PyTreeString(self._s.upper())


register_pytree_node(
    PyTreeString,
    lambda s: ((), s._s),
    lambda aux, _children: PyTreeString(aux),
)


def hide_strings(tree):
    """Wrap every raw `str` leaf in a :class:`PyTreeString`."""
    return tree_map(
        lambda x: PyTreeString(x) if isinstance(x, str) else x,
        tree,
        is_leaf=lambda x: isinstance(x, str),
    )
