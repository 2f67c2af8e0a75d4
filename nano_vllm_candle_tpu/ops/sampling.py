"""On-device token sampling.

The reference samples on host: it downloads the full-vocab logits row per
sequence, exponentiates in Rust, and draws via ``WeightedIndex``
(``/root/reference/src/engine/llm_engine.rs:97-133``). On TPU that
device→host round trip would dominate decode latency, so sampling is a jitted
op over the batch: greedy where ``temperature == 0``, otherwise
temperature-scaled categorical with optional top-k / top-p masking, all
vectorized over sequence slots with per-slot parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def _apply_top_k(logits: jax.Array, top_k: jax.Array, max_top_k: int) -> jax.Array:
    """Mask logits below each row's top-k threshold. top_k == 0 disables.

    Uses a static ``max_top_k`` bound so the lax.top_k shape is fixed; the
    per-row dynamic k selects a threshold within the static candidates.
    """
    max_top_k = min(max_top_k, logits.shape[-1])
    vals, _ = jax.lax.top_k(logits, max_top_k)  # [B, max_top_k] descending
    k = jnp.clip(top_k, 1, max_top_k)
    thresh = jnp.take_along_axis(vals, (k - 1)[:, None], axis=-1)  # [B, 1]
    masked = jnp.where(logits < thresh, NEG_INF, logits)
    return jnp.where((top_k > 0)[:, None], masked, logits)


TOP_P_CANDIDATES = 256  # static nucleus candidate bound (see _apply_top_p)


def _apply_top_p(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus sampling mask. top_p == 1.0 disables (row passes through).

    Bounded-candidate formulation: instead of sorting the full vocab
    (a [B, 151936] sort per decode step — measured as the dominant sampling
    cost), take the top ``TOP_P_CANDIDATES`` logits and normalize them
    against the FULL distribution via one logsumexp (no sort). The nucleus
    threshold is exact whenever it falls within the candidates; a nucleus
    wider than 256 tokens (top_p extremely close to 1) degrades gracefully
    to top-256 — a tighter truncation than requested, never a looser one.
    """
    C = min(TOP_P_CANDIDATES, logits.shape[-1])
    vals, _ = jax.lax.top_k(logits, C)  # [B, C] descending
    lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    probs = jnp.exp(vals - lse)  # true probabilities of the candidates
    cum = jnp.cumsum(probs, axis=-1)
    # Keep tokens while cumulative prob (exclusive) < top_p; always keep top-1.
    keep = (cum - probs) < top_p[:, None]
    # Threshold = smallest kept logit per row.
    thresh = jnp.min(jnp.where(keep, vals, jnp.inf), axis=-1, keepdims=True)
    masked = jnp.where(logits < thresh, NEG_INF, logits)
    return jnp.where((top_p < 1.0)[:, None], masked, logits)


def sample_tokens(
    rng: jax.Array,
    logits: jax.Array,
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    *,
    max_top_k: int = 64,
    use_top_k: bool = True,
    use_top_p: bool = True,
    greedy_only: bool = False,
) -> jax.Array:
    """Sample one token id per row.

    Args:
      rng: PRNG key.
      logits: ``[B, V]`` (any float dtype; promoted to f32).
      temperature: ``[B]`` f32 — 0.0 means greedy for that row.
      top_k: ``[B]`` int32 — 0 disables.
      top_p: ``[B]`` f32 — 1.0 disables.
      max_top_k: static top-k bound (compile-time).
      use_top_k/use_top_p: static flags letting the runner compile cheaper
        variants when no request in the batch uses the feature.
      greedy_only: static flag — every row has temperature 0, so compile
        argmax alone. Without it the per-row ``where(temperature == 0)``
        select forces XLA to evaluate BOTH branches, and the categorical
        branch's gumbel noise + full-vocab reductions measured ~2.9 ms of
        (partially overlapped) device time per step at bs64 even when no
        row ever used it.

    Returns:
      ``[B]`` int32 token ids.
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy_only:
        return greedy

    safe_temp = jnp.where(temperature > 0, temperature, 1.0)
    scaled = logits / safe_temp[:, None]
    if use_top_k:
        scaled = _apply_top_k(scaled, top_k, max_top_k)
    if use_top_p:
        scaled = _apply_top_p(scaled, top_p)
    sampled = jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)

    return jnp.where(temperature == 0.0, greedy, sampled)
