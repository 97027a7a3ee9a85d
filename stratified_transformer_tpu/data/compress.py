"""Host->device batch payload compression (uint16 index narrowing).

The training batch at the S3DIS operating point (n_pad 40960) ships
~13 MB/step over the tunneled runtime, and most of it is int32 index
arrays whose values are bounded by the (padded) point count of some
pyramid level: ``stem_nidx`` [n_pad, 34] alone is 5.6 MB, the host
pyramid's ``idx``/``knn_idx``/``up.idx`` another ~3 MB.  Every one of
those arrays is built gather-safe — masked slots hold the point's own
index, never ``-1`` (``data/collate.py:with_stem_neighbors``,
``data/pyramid.py``) — so when ``n_pad < 65536`` they all fit uint16
exactly.  Narrowing on the host halves their transfer bytes; the jitted
step widens them back to int32 as its first op (a fused
``convert_element_type``, free against the step).

The gate is STATIC (config ``n_pad``), never data-dependent: a
data-dependent dtype would change the jit signature between batches and
recompile.  ScanNet-scale configs (n_pad >= 65536) are left untouched.

Labels ride along only when provably safe: class ids plus a
non-negative ignore sentinel (255 by convention, reference
``util/data_util.py``) fit, but ScanNetv2-style ``ignore_label: -100``
(reference ``config/scannetv2/*.yaml``) would wrap to 65436 under
uint16, so every array is range-checked before narrowing — anything
holding a negative or >= 65536 value ships as-is.

The reference has no analogue — its DataLoader ships CPU torch tensors
over PCIe where narrowing is not worth the cast; over the axon tunnel
(~100 MB/s effective, docs/PERF_NOTES.md "Dispatch/transfer RTT") it is.
"""

from __future__ import annotations

import numpy as np

# keys never narrowed: scene offsets take part in host-side arithmetic
# (np.diff / cumsum in eval tools) where silent uint16 wraparound on a
# subtraction would be a footgun for a few dozen saved bytes.
_SKIP = ("offsets",)
# keys whose values are point/level indices: bounded by the (static)
# padded point count by construction (collate/pyramid build them
# gather-safe), so narrowing is decided by n_pad alone.
_INDEX_KEYS = ("stem_nidx", "idx", "knn_idx")


def _narrow(x):
    if (isinstance(x, np.ndarray) and x.dtype in (np.int32, np.int64)
            and x.size):
        return x.astype(np.uint16)
    return x


def compress_batch(batch, n_pad, ignore_label=255):
    """Narrow a host batch dict's index/label arrays to uint16.

    No-op (returns ``batch`` unchanged) when any point count can reach
    65536.  Bool masks and float arrays pass through; nested pytrees
    (the host pyramid) are walked recursively.

    The narrowing decision is STATIC per key (index keys are bounded by
    the padded point count by construction; ``labels`` narrows only when
    the config's ``ignore_label`` fits uint16) — a per-batch value scan
    would make the shipped dtype data-dependent and retrace the jitted
    step whenever e.g. a fully-annotated ScanNet crop happens to contain
    no -100 sentinel (jit signatures must not flap batch-to-batch).
    """
    if n_pad >= 65536:
        return batch
    labels_ok = 0 <= int(ignore_label) < 65536

    def walk(obj):
        if isinstance(obj, dict):
            out = {}
            for k in obj:
                if k in _SKIP:
                    out[k] = obj[k]
                elif k == "labels":
                    out[k] = _narrow(obj[k]) if labels_ok else obj[k]
                elif k in _INDEX_KEYS:
                    out[k] = _narrow(obj[k])
                elif isinstance(obj[k], (dict, tuple, list)):
                    out[k] = walk(obj[k])
                else:
                    out[k] = obj[k]
            return out
        if isinstance(obj, (tuple, list)):
            return type(obj)(walk(v) for v in obj)
        return obj

    return walk(batch)


def widen_batch(batch):
    """Inverse of :func:`compress_batch`, for use INSIDE a jitted step.

    Unconditionally maps every unsigned sub-int32 leaf back to int32 —
    a no-op program when the loader shipped plain int32 (so every step
    function can call it unconditionally).
    """
    import jax.numpy as jnp

    def widen(x):
        if hasattr(x, "dtype") and x.dtype in (jnp.uint16, jnp.uint8):
            return x.astype(jnp.int32)
        return x

    import jax
    return jax.tree.map(widen, batch)
