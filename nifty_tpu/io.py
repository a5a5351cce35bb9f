"""Persistence helpers: samples and model outputs to pickle / HDF5.

The jax-native counterpart of the reference's sample-list persistence
(``nifty/cl/minimization/sample_list.py:104,295-364``): posterior
:class:`~nifty_tpu.evi.Samples` round-trip through pickle (exact resume)
and export to HDF5 with per-key datasets plus summary statistics —
including outputs of arbitrary models evaluated over the samples.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Mapping, Optional

import jax
import numpy as np

from .evi import Samples
__all__ = ["save_samples", "load_samples", "samples_to_hdf5"]


def save_samples(samples: Samples, path: str):
    """Pickle `samples` (atomically via a temp file)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(jax.device_get(samples), f)
    os.replace(tmp, path)


def load_samples(path: str) -> Samples:
    with open(path, "rb") as f:
        out = pickle.load(f)
    if not isinstance(out, Samples):
        raise TypeError(f"{path} does not hold a Samples object")
    return out


def _to_group(group, name, tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    sub = group.create_group(name)
    for i, leaf in enumerate(leaves):
        sub.create_dataset(str(i), data=np.asarray(leaf))
    sub.attrs["treedef"] = str(treedef)


def samples_to_hdf5(
    samples: Samples,
    path: str,
    *,
    operators: Optional[Mapping[str, Callable]] = None,
    overwrite: bool = False,
):
    """Export samples (and optional model outputs over them) to HDF5.

    For each entry in `operators` (name → callable on a single sample)
    the per-sample outputs, their mean, and their std are stored under
    ``/<name>/{samples,mean,std}``.
    """
    import h5py

    if os.path.exists(path) and not overwrite:
        raise FileExistsError(f"{path} exists (pass overwrite=True)")
    operators = {} if operators is None else dict(operators)
    operators.setdefault("latent", lambda x: x)
    with h5py.File(path, "w") as f:
        f.attrs["n_samples"] = len(samples)
        for name, op in operators.items():
            outs = [jax.device_get(op(s)) for s in samples]
            stacked = jax.tree_util.tree_map(
                lambda *a: np.stack(a, axis=0), *outs
            )
            grp = f.create_group(name)
            _to_group(grp, "samples", stacked)
            mean = jax.tree_util.tree_map(lambda a: a.mean(axis=0), stacked)
            std = jax.tree_util.tree_map(
                lambda a: a.std(axis=0, ddof=1) if a.shape[0] > 1 else np.zeros_like(a[0]),
                stacked,
            )
            _to_group(grp, "mean", mean)
            _to_group(grp, "std", std)
