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


def sharded_pallas_scan_hits(scanner, codes: np.ndarray, mesh: Mesh,
                             axis: str = "data", interpret: bool = False):
    """The FUSED pallas scan pipeline, data-parallel over a device mesh.

    Each shard runs the full single-chip fast path
    (:func:`..ops.pallas.scan_kernel.pallas_scan_hits`: Mosaic microblock
    filter -> compaction -> exact rescore -> packed hit row) on its
    position slice plus a static right halo of ``Lmax - 1 + k``; the
    tiny packed rows ride ONE ``all_gather`` over ICI.  A window is owned
    by the shard containing its start, so decoding each shard's row with
    ``n = shard_len`` drops halo-started duplicates and concatenating in
    shard order yields the position-major global hit list.

    Host-side overflow handling matches the single-chip path: if any
    shard's true counts exceed the caps, the caps grow (stickily, on the
    scanner) and the sharded call reruns — correctness never depends on
    capacity.

    Yields (end, pid, mism) tuples in global coordinates.  ``interpret``
    runs the Mosaic kernel in interpreter mode (the virtual CPU mesh used
    by tests; real meshes compile)."""
    from ..ops.pallas.scan_kernel import kernel_weights, pallas_scan_hits

    t = scanner.tables
    if scanner._pallas_wt is None:
        W, thr, classes = kernel_weights(t, scanner.k, scanner.poison_eos)
        scanner._pallas_wt = (jnp.asarray(W), jnp.asarray(thr), classes)
    W, thr, classes = scanner._pallas_wt
    T = 65536 if W.shape[1] // 128 == 1 else 16384
    halo = t.Lmax - 1 + scanner.k
    shards, shard_len = shard_codes(
        np.asarray(codes), mesh, halo, t.eos_code, axis)
    shards = jnp.asarray(shards, jnp.uint8)

    while True:
        cap_mb, hit_cap = scanner._cap_mb, scanner._hit_cap

        def per_shard(codes_block, W, thr, wconv, thresholds, lengths):
            row = pallas_scan_hits.__wrapped__(
                codes_block[0], W, thr, wconv, thresholds, lengths,
                classes=classes, alpha=t.alpha, Lmax=t.Lmax,
                eos_code=t.eos_code, T=T, MB=scanner._MB, cap_mb=cap_mb,
                hit_cap=hit_cap, interpret=interpret,
            )
            return jax.lax.all_gather(row, axis)[None]

        rows = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(axis, None), P(), P(), P(), P(), P()),
            out_specs=P(axis, None, None),
            check_vma=False,
        )(shards, W, thr, scanner.weights, scanner.thresholds,
          scanner.lengths_dev)
        rows = np.asarray(jax.device_get(rows[0]))  # [n_dev, rowlen]
        if (rows[:, 0] <= cap_mb).all() and (rows[:, 1] <= hit_cap).all():
            break
        # a shard overflowed: grow the caps past the worst observed true
        # counts and rerun (sticky, same policy as ConvScanner._redispatch)
        mbt = max(int(rows[:, 0].max()), 1)
        ht = max(int(rows[:, 1].max()), 1)
        scanner._cap_mb = max(cap_mb, 1 << (mbt - 1).bit_length())
        scanner._hit_cap = max(hit_cap, 1 << (ht - 1).bit_length())

    def gen():
        for i in range(rows.shape[0]):
            base = i * shard_len
            for end, pid, mism in scanner._decode_packed(
                    rows[i], None, shard_len, interpret,
                    (cap_mb, hit_cap)):
                yield end + base, pid, mism

    return gen()
