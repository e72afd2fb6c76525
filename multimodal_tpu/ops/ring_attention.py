"""Ring attention: sequence-parallel attention over a mesh axis (the 'sp' story).

The reference stack never shards the sequence dimension (its encoders top out at S=257 and
its GPT-2 decoder at S=1024, both per-GPU). On TPU the idiomatic long-context scale-out is
ring attention over ICI: shard Q/K/V on the sequence axis, keep the local Q block resident,
and stream K/V blocks around the ring with ``lax.ppermute`` while an online-softmax
accumulator (the flash-attention recurrence, ops/flash_attention.py) folds each visiting
block in. Peak memory per chip is O(S_local^2-free): no chip ever holds the S x S logits, and
each hop's transfer overlaps the matmul of the block that just arrived (XLA schedules the
ppermute asynchronously).

Differentiable for free: the VJP of ``ppermute`` is the inverse rotation, so jax.grad
produces the reverse ring schedule — no hand-written backward.

Use inside shard_map with the sequence axis sharded over ``axis_name``:

    out = shard_map(lambda q, k, v: ring_attention(q, k, v, 'seq'),
                    mesh=mesh, in_specs=P(None, 'seq', None, None), ...)

Causal masking uses global positions reconstructed from the ring step, so a causal
sequence-sharded decoder matches the dense causal attention exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _block_attn(q, k, v, q_pos, k_pos, causal: bool):
    """One Q-block x K/V-block partial attention: returns (m, l, o) online-softmax stats.

    q: [B,Sq,H,D], k/v: [B,Sk,H,D]; q_pos/k_pos: global position offsets (ints) of the
    blocks. m,l: [B,H,Sq] f32; o: [B,Sq,H,D] f32 (unnormalized numerator).
    """
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * (1.0 / (d ** 0.5))
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        qp = q_pos + jnp.arange(sq)
        kp = k_pos + jnp.arange(sk)
        logits = jnp.where((qp[:, None] >= kp[None, :])[None, None], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)  # [B,H,Sq]
    p = jnp.exp(logits - m[..., None])
    # a FULLY-masked row has m = NEG_INF and p = exp(0) = 1 junk; zero it explicitly so
    # the block contributes (m=NEG_INF, l=0, o=0) and the accumulator combine is correct
    # for any block visit order (every causal row still sees >=1 valid key overall: the
    # diagonal block)
    p = jnp.where(logits > 0.5 * NEG_INF, p, 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return m, l, o


def ring_attention(q, k, v, axis_name, *, causal: bool = False):
    """Sequence-sharded multi-head attention inside shard_map.

    q, k, v: LOCAL blocks [B, S_local, H, Dh], the sequence axis sharded over
    ``axis_name`` in ring order (shard i holds positions [i*S_local, (i+1)*S_local)).
    Returns the local output block [B, S_local, H, Dh] in q.dtype — bit-comparable to
    dense attention over the gathered sequence (f32 accumulation, flash recurrence).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, s_local, h, d = q.shape
    q_pos = idx * s_local

    # K/V travel the ring: after t hops, shard i holds block (i - t) mod n
    perm = [(i, (i + 1) % n) for i in range(n)]

    # the resident (t=0) block is computed BEFORE the ring starts; each of the n-1 scan
    # iterations then permutes-then-computes, so exactly n-1 ppermutes run — a rotation
    # after the last visited block would be dead traffic the compiler cannot DCE inside
    # the loop (and the VJP mirrors the schedule, doubling the waste)
    m0, l0, o0 = _block_attn(q, k, v, q_pos, idx * s_local, causal)

    def body(carry, t):
        k_cur, v_cur, m_acc, l_acc, o_acc = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        kv_idx = (idx - t) % n
        m_blk, l_blk, o_blk = _block_attn(q, k_cur, v_cur, q_pos, kv_idx * s_local, causal)
        m_new = jnp.maximum(m_acc, m_blk)
        c_acc = jnp.exp(m_acc - m_new)
        c_blk = jnp.exp(m_blk - m_new)
        l_new = l_acc * c_acc + l_blk * c_blk
        # m,l are [B,H,S]; o is [B,S,H,D] — move the coefficients to o's layout
        o_new = (o_acc * jnp.transpose(c_acc, (0, 2, 1))[..., None]
                 + o_blk * jnp.transpose(c_blk, (0, 2, 1))[..., None])
        return (k_cur, v_cur, m_new, l_new, o_new), None

    (k, v, m, l, o), _ = jax.lax.scan(body, (k, v, m0, l0, o0), jnp.arange(1, n))
    l = jnp.maximum(l, 1e-30)  # causal first block: every row attends to >=1 position
    out = o / jnp.transpose(l, (0, 2, 1))[..., None]
    return out.astype(q.dtype)
