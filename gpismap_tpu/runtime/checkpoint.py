"""Checkpoint / resume for online mappers.

The reference has no persistence at all — map state lives in a process
global and 'reset' is the only lifecycle op (mexGPisMap.cpp:28,123-130;
SURVEY.md §5.4). Here the flat-array design makes checkpointing exact and
cheap: the native index serializes its pools verbatim and the cluster-GP
store is a pytree of arrays.
"""
from __future__ import annotations

import numpy as np

from ..models import cluster

_FORMAT = 1


def save(mapper, path: str) -> None:
    """Save a GPisMap2D/GPisMap3D to an .npz file (exact state)."""
    blob = mapper.index.serialize()
    store = {f"store_{k}": np.asarray(v)
             for k, v in mapper.store._asdict().items()}
    np.savez_compressed(
        path, format=_FORMAT, dim=mapper.dim, frame=mapper.frame,
        index_blob=blob, **store)


def load(mapper, path: str) -> None:
    """Restore state saved by `save` into a compatibly-configured mapper
    (same dim / tree params / capacities)."""
    import jax.numpy as jnp

    d = np.load(path)
    if int(d["format"]) != _FORMAT:
        raise ValueError(f"unsupported checkpoint format {int(d['format'])}")
    if int(d["dim"]) != mapper.dim:
        raise ValueError("checkpoint dimensionality mismatch")
    mapper.index.deserialize(d["index_blob"])
    fields = {k[len("store_"):]: jnp.asarray(d[k])
              for k in d.files if k.startswith("store_")}
    ref = mapper.store
    for k, v in fields.items():
        if getattr(ref, k).shape != v.shape:
            raise ValueError(
                f"store field {k}: capacity mismatch "
                f"{getattr(ref, k).shape} vs {v.shape}")
    mapper.store = cluster.ClusterStore(**fields)
    mapper.frame = int(d["frame"])
    mapper._factors = None
    mapper._factors_slots = None
    mapper._nbrs = None
    mapper._mirror = None
    mapper._rebuild_grid()
