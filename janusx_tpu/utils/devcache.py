"""Host->device transfer cache.

Repeated scans over the same trait/basis (multi-model runs, CV folds,
FarmCPU iterations) would otherwise re-upload identical large buffers
(rotation matrix, packed genotypes) on every call — costly through remote
TPU links. Keyed by (id(array), dtype, shape) with a weakref finalizer so
entries die with their host array; id() values can only be reused after
the original array is garbage collected, at which point the finalizer has
already evicted the stale entry.
"""

from __future__ import annotations

import weakref

import jax.numpy as jnp
import numpy as np

_cache: dict = {}


def to_device(arr: np.ndarray, dtype=None):
    """jnp.asarray with caching for numpy inputs."""
    if not isinstance(arr, np.ndarray):
        return jnp.asarray(arr, dtype) if dtype is not None else jnp.asarray(arr)
    key = (id(arr), np.dtype(dtype) if dtype is not None else arr.dtype, arr.shape)
    hit = _cache.get(key)
    if hit is not None:
        return hit
    dev = jnp.asarray(arr, dtype) if dtype is not None else jnp.asarray(arr)
    try:
        weakref.finalize(arr, _cache.pop, key, None)
        _cache[key] = dev
    except TypeError:
        pass  # not weakref-able; skip caching
    return dev


def to_device_padded_rows(arr: np.ndarray, rows: int, fill, dtype=None):
    """Pad the leading axis to ``rows`` then upload, cached on the SOURCE
    array identity (padding allocates a fresh host array every call, which
    would defeat the plain cache)."""
    if not isinstance(arr, np.ndarray):
        arr = np.asarray(arr)
    key = (
        id(arr),
        rows,
        fill,
        np.dtype(dtype) if dtype is not None else arr.dtype,
        arr.shape,
    )
    hit = _cache.get(key)
    if hit is not None:
        return hit
    if arr.shape[0] != rows:
        pad = np.full((rows - arr.shape[0],) + arr.shape[1:], fill, dtype=arr.dtype)
        padded = np.concatenate([arr, pad], axis=0)
    else:
        padded = arr
    dev = jnp.asarray(padded, dtype) if dtype is not None else jnp.asarray(padded)
    try:
        weakref.finalize(arr, _cache.pop, key, None)
        _cache[key] = dev
    except TypeError:
        pass
    return dev


def device_packed(pg, m_pad: int, lane_align: int = 128):
    """Lane-pad + row-pad + upload a PackedGenotypes buffer, cached on the
    identity of pg.packed (both paddings allocate fresh arrays)."""
    from janusx_tpu.ops import decode as _decode

    src = pg.packed
    key = (id(src), "packed", m_pad, lane_align, src.shape)
    hit = _cache.get(key)
    if hit is not None:
        return hit
    padded = _decode.pad_packed_cols(src, lane_align)
    if padded.shape[0] != m_pad:
        pad = np.full((m_pad - padded.shape[0], padded.shape[1]), 0xFF, np.uint8)
        padded = np.concatenate([padded, pad], axis=0)
    dev = jnp.asarray(padded)
    try:
        weakref.finalize(src, _cache.pop, key, None)
        _cache[key] = dev
    except TypeError:
        pass
    return dev


def clear() -> None:
    _cache.clear()
