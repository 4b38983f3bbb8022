"""Device-side index compaction (the "variable-rate hit emission" primitive).

Every scan pipeline ends with "extract the indices of the set bits of a
huge, almost-empty mask into a fixed-capacity buffer" — the TPU-native
stand-in for the reference's incremental hit emission
(``pattern_match.h:105-133``'s find_patterns batches).  ``jnp.nonzero``
lowers to a full-array cumsum + scatter on this backend (~5 ms per 500K
elements, as slow as the whole scan kernel); :func:`compact_mask` instead
ranks set positions with ``lax.top_k`` over descending keys (~6x faster
here), which preserves the same ascending-index, first-``cap``-survivors,
``fill = mask.size`` contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_mask(mask, cap: int):
    """Indices of the set entries of a flat boolean mask.

    Returns ``(count, idx)`` where ``count`` is the total number of set
    entries (``int32``; caller detects overflow as ``count > cap``) and
    ``idx`` is ``[cap] int32``: the first ``cap`` set positions in
    ascending order, padded with ``mask.size``  — exactly the contract of
    ``jnp.nonzero(mask, size=cap, fill_value=mask.size)``.
    """
    n = mask.shape[0]
    count = jnp.sum(mask, dtype=jnp.int32)
    keys = jnp.where(mask, n - jax.lax.broadcasted_iota(jnp.int32, (n,), 0),
                     0)
    vals, _ = jax.lax.top_k(keys, min(cap, n))
    idx = jnp.where(vals > 0, n - vals, n).astype(jnp.int32)
    if cap > n:
        idx = jnp.concatenate(
            [idx, jnp.full((cap - n,), n, jnp.int32)])
    return count, idx
