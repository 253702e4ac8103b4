"""Ring attention: exact attention over a sequence-sharded token axis.

New capability beyond the reference (SURVEY.md §5 long-context): the
reference caps at 1024² imagery because its global attention materializes
the full (N, N) matrix on one GPU.  Here the token axis shards over a mesh
`seq` axis; each device keeps its query chunk resident while K/V chunks
rotate around the ring via `ppermute`, merging partial softmax results with
the online (m, l, o) recurrence — memory per device is O(N²/s) logits and
O(N/s) activations, communication rides the ICI ring.

Pure-JAX inside `shard_map` (XLA fuses the per-chunk attention; the Pallas
flash kernel stays the single-chip fast path — this layer is about scaling
N beyond one chip's HBM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _chunk_attention(q, k, v, bias, scale):
    """One Q-chunk x KV-chunk partial: returns (scores-exp o, m, l)."""
    s = jnp.einsum("bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias
    m = jnp.max(s, axis=-1)  # (B, Nq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o, m, l


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: float,
    bias_rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exact softmax attention with K/V rotating around the `axis_name` ring.

    Call INSIDE shard_map.  q, k, v: (B, N_local, d) — this device's chunk of
    the global sequence.  bias_rows: optional (B, N_local, N_global) — the
    LOCAL query rows of the full attention bias (e.g. decomposed rel-pos);
    columns for the in-flight KV chunk are sliced per rotation.
    Returns (B, N_local, d) fp32.
    """
    size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, n_local, d = q.shape
    perm = [(j, (j + 1) % size) for j in range(size)]

    def body(t, carry):
        o, m, l, kc, vc = carry
        # after t rotations this device holds the chunk that started on
        # device (idx - t) mod size -> global column offset src * n_local
        src = (idx - t) % size
        b = None
        if bias_rows is not None:
            b = jax.lax.dynamic_slice_in_dim(bias_rows, src * n_local, n_local, axis=2)
        oc, mc, lc = _chunk_attention(q, kc, vc, b, scale)
        m_new = jnp.maximum(m, mc)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(mc - m_new)
        o = o * c_old[..., None] + oc * c_new[..., None]
        l = l * c_old + lc * c_new
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return o, m_new, l, kc, vc

    o0 = jnp.zeros((B, n_local, d), jnp.float32)
    m0 = jnp.full((B, n_local), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, n_local), jnp.float32)
    o, m, l, _, _ = jax.lax.fori_loop(0, size, body, (o0, m0, l0, k, v))
    return o / l[..., None]


def ring_attention_relpos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    grid_w: int,
    axis_name: str,
    scale: float,
) -> jnp.ndarray:
    """Ring attention with SAM's decomposed rel-pos bias
    (s[q, c] = q.k*scale + rel_h[q, c // W] + rel_w[q, c % W]).

    Call INSIDE shard_map.  q/k/v: (B, N_local, d) local chunks; rel_h:
    (B, N_local, Kh) and rel_w: (B, N_local, Kw) are the LOCAL query rows of
    the decomposed tables (precomputed as in flash_attention_relpos).  The
    bias block for the in-flight KV chunk is gathered per rotation — no
    (N, N) bias ever materializes.
    """
    size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, n_local, d = q.shape
    perm = [(j, (j + 1) % size) for j in range(size)]

    def body(t, carry):
        o, m, l, kc, vc = carry
        src = (idx - t) % size
        cols = src * n_local + jnp.arange(n_local)  # global column ids
        b = (
            jnp.take(rel_h, cols // grid_w, axis=2)
            + jnp.take(rel_w, cols % grid_w, axis=2)
        )
        oc, mc, lc = _chunk_attention(q, kc, vc, b, scale)
        m_new = jnp.maximum(m, mc)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(mc - m_new)
        o = o * c_old[..., None] + oc * c_new[..., None]
        l = l * c_old + lc * c_new
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return o, m_new, l, kc, vc

    o0 = jnp.zeros((B, n_local, d), jnp.float32)
    m0 = jnp.full((B, n_local), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, n_local), jnp.float32)
    o, m, l, _, _ = jax.lax.fori_loop(0, size, body, (o0, m0, l0, k, v))
    return o / l[..., None]


def sp_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    scale: float,
    bias: Optional[jnp.ndarray] = None,
    axis: str = "seq",
) -> jnp.ndarray:
    """shard_map convenience: global (B, N, d) q/k/v (and optional (B, N, N)
    bias) sharded over `axis` along N; returns the exact attention output
    with the same sequence sharding."""
    from jax import shard_map

    spec_t = P(None, axis, None)
    in_specs = [spec_t, spec_t, spec_t]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(P(None, axis, None))
        args.append(bias)

        def fn(q, k, v, b):
            return ring_attention(q, k, v, axis, scale, bias_rows=b)
    else:

        def fn(q, k, v):
            return ring_attention(q, k, v, axis, scale)

    return shard_map(fn, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=spec_t, check_vma=False)(*args)


def sp_flash_attention_relpos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    Rh: jnp.ndarray,
    Rw: jnp.ndarray,
    hw,
    scale: float,
    mesh: Mesh,
    axis: str = "seq",
) -> jnp.ndarray:
    """Sequence-parallel drop-in for `flash_attention_relpos`: same signature
    plus (mesh, axis).  Shards the token axis (row-major H rows) over `axis`;
    each device computes its local rel-pos rows from its Q chunk and runs the
    K/V ring.  Requires H % mesh.shape[axis] == 0."""
    from jax import shard_map

    H, W = hw
    B, N, d = q.shape
    size = mesh.shape[axis]
    assert H % size == 0, f"token rows {H} must divide the {axis}={size} axis"

    def fn(q, k, v, Rh, Rw):
        idx = jax.lax.axis_index(axis)
        Bl, nl, _ = q.shape
        hl = nl // W
        qg = q.reshape(Bl, hl, W, d)
        Rh_l = jax.lax.dynamic_slice_in_dim(Rh, idx * hl, hl, 0)
        rel_h = jnp.einsum(
            "bhwc,hkc->bhwk", qg, Rh_l.astype(qg.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(Bl, nl, H)
        rel_w = jnp.einsum(
            "bhwc,wkc->bhwk", qg, Rw.astype(qg.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(Bl, nl, W)
        return ring_attention_relpos(q, k, v, rel_h, rel_w, W, axis, scale)

    spec_t = P(None, axis, None)
    return shard_map(
        fn, mesh=mesh, in_specs=(spec_t, spec_t, spec_t, P(), P()),
        out_specs=spec_t, check_vma=False,
    )(q, k, v, Rh, Rw)
