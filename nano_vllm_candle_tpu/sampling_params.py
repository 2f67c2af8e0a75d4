"""Per-request sampling parameters.

Mirrors the reference API (``/root/reference/src/sampling_params.rs:1-46``:
temperature / max_tokens / ignore_eos with chainable ``with_*`` builders and a
panic on temperature <= 1e-10) and extends it with greedy mode, top-k and
top-p — the reference has no explicit greedy path (it clamps temperature to
>=1e-6 and only falls back to argmax on numeric failure,
``/root/reference/src/engine/llm_engine.rs:105,120-122``).

TPU-native difference: these fields are compiled into the on-device sampling
op (``ops/sampling.py``) as per-slot vectors, so sampling never ships logits
back to the host the way the reference does
(``/root/reference/src/engine/llm_engine.rs:97-133``).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class SamplingParams:
    """Sampling configuration for one request.

    ``temperature == 0.0`` means greedy (argmax) decoding. Positive
    temperatures must exceed 1e-10, matching the reference's assertion
    (``sampling_params.rs:20,30``).
    """

    temperature: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False
    top_k: int = 0  # 0 disables top-k
    top_p: float = 1.0  # 1.0 disables top-p

    def __post_init__(self) -> None:
        if self.temperature != 0.0 and self.temperature <= 1e-10:
            raise ValueError("temperature must be 0 (greedy) or > 1e-10 for sampling")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k < 0:
            raise ValueError("top_k must be >= 0")
        if self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")

    # -- chainable builders, mirroring sampling_params.rs:28-45 --------------

    def with_temperature(self, temperature: float) -> "SamplingParams":
        return dataclasses.replace(self, temperature=temperature)

    def with_max_tokens(self, max_tokens: int) -> "SamplingParams":
        return dataclasses.replace(self, max_tokens=max_tokens)

    def with_ignore_eos(self, ignore_eos: bool) -> "SamplingParams":
        return dataclasses.replace(self, ignore_eos=ignore_eos)

    def with_top_k(self, top_k: int) -> "SamplingParams":
        return dataclasses.replace(self, top_k=top_k)

    def with_top_p(self, top_p: float) -> "SamplingParams":
        return dataclasses.replace(self, top_p=top_p)

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0
