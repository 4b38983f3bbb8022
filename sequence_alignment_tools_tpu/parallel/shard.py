"""Multi-chip position sharding for the scan kernels.

The TPU-native parallelism the reference never had (SURVEY §2f): the flat
code array is sharded along the position axis across a 1-D device mesh, each
shard scans its slice plus a static left halo of ``Lmax - 1 + k`` characters
(so every window is owned by exactly one shard — the one containing its
start), the pattern tables are replicated to every chip, and per-pattern hit
counts are reduced with ``jax.lax.psum`` over ICI.  A hit belongs to the
shard containing its window start; the halo guarantees no window is missed
and none is double-counted.

This mirrors the only scaling hooks the reference has — ``allvall``'s
chunked block decomposition merged by ``allvall_merge`` and the
batch-boundary deferral in every ``find_patterns`` caller
(filter_bitvec.cc:118-121) — as static SPMD sharding instead of manual
file-level chunking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_codes(codes: np.ndarray, mesh: Mesh, halo: int,
                eos_code: int, axis: str = "data"):
    """Pad codes to a multiple of the mesh size and build the per-shard
    [n_shards, shard + halo] overlapped layout (halos materialized by
    overlapping slices at load time — no runtime communication)."""
    n_dev = mesh.devices.size
    n = len(codes)
    shard = -(-n // n_dev)
    padded = np.full(n_dev * shard, eos_code, dtype=np.int32)
    padded[:n] = codes
    out = np.full((n_dev, shard + halo), eos_code, dtype=np.int32)
    for i in range(n_dev):
        start = i * shard
        out[i, :shard] = padded[start : start + shard]
        # right halo continues into the next shard
        tail = padded[start + shard : start + shard + halo]
        out[i, shard : shard + len(tail)] = tail
    sharding = NamedSharding(mesh, P(axis, None))
    return jax.device_put(out, sharding), shard


@functools.partial(
    jax.jit, static_argnames=("alpha", "mesh", "axis")
)
def sharded_scan_counts(shards, weights, thresholds, lengths, alpha,
                        mesh, axis: str = "data"):
    """All-shard exact/k-mismatch scan returning replicated per-pattern hit
    counts [P] (the ``patcount`` reduction, primer_match.cc:1236-1247, as a
    psum over the mesh)."""

    def per_shard(codes_block, weights, thresholds, lengths):
        codes = codes_block[0]
        Lmax = weights.shape[0]
        B = codes.shape[0] - Lmax + 1
        onehot = jax.nn.one_hot(codes, alpha, dtype=jnp.bfloat16)

        def step(j, acc):
            window = jax.lax.dynamic_slice_in_dim(onehot, j, B, axis=0)
            return acc + jnp.dot(
                window, weights[j], preferred_element_type=jnp.float32
            )

        out = jax.lax.fori_loop(
            0, Lmax, step, jnp.zeros((B, weights.shape[2]), jnp.float32)
        )
        hit = out >= thresholds[None, :]
        counts = jnp.sum(hit, axis=0, dtype=jnp.int32)
        return jax.lax.psum(counts, axis)[None]

    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )(shards, weights, thresholds, lengths)


@functools.partial(
    jax.jit, static_argnames=("alpha", "mesh", "axis", "cap")
)
def sharded_scan_hits(shards, weights, thresholds, lengths, alpha,
                      mesh, axis: str = "data", cap: int = 4096):
    """All-shard scan returning the REPLICATED global hit list.

    Each shard extracts its local (window-start, pattern) hits into a
    fixed-capacity buffer (overflow detectable via the returned counts),
    rebases starts to global coordinates, and the lists ride one
    ``all_gather`` over ICI.  Returns (counts [n_dev], starts
    [n_dev, cap], pids [n_dev, cap]) replicated on every chip; unused
    slots hold -1.  The deterministic global order is the position-major
    sort of the concatenation (shards own disjoint start ranges, so
    concatenation order == shard order == position order)."""

    def per_shard(codes_block, weights, thresholds, lengths):
        codes = codes_block[0]
        Lmax = weights.shape[0]
        P = weights.shape[2]
        B = codes.shape[0] - Lmax + 1
        onehot = jax.nn.one_hot(codes, alpha, dtype=jnp.bfloat16)

        def step(j, acc):
            window = jax.lax.dynamic_slice_in_dim(onehot, j, B, axis=0)
            return acc + jnp.dot(
                window, weights[j], preferred_element_type=jnp.float32
            )

        out = jax.lax.fori_loop(
            0, Lmax, step, jnp.zeros((B, weights.shape[2]), jnp.float32)
        )
        hit = out >= thresholds[None, :]
        flat = hit.reshape(-1)
        count = jnp.sum(flat, dtype=jnp.int32)
        (idx,) = jnp.nonzero(flat, size=cap, fill_value=flat.shape[0])
        valid = idx < flat.shape[0]
        base = jax.lax.axis_index(axis).astype(jnp.int32) * B
        starts = jnp.where(valid, idx // P + base, -1).astype(jnp.int32)
        pids = jnp.where(valid, idx % P, -1).astype(jnp.int32)
        return (
            jax.lax.all_gather(count, axis)[None],
            jax.lax.all_gather(starts, axis)[None],
            jax.lax.all_gather(pids, axis)[None],
        )

    counts, starts, pids = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P()),
        out_specs=(P(axis, None), P(axis, None, None), P(axis, None, None)),
        check_vma=False,
    )(shards, weights, thresholds, lengths)
    return counts[0], starts[0], pids[0]
