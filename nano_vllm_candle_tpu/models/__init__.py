"""Model implementations and registry.

The reference supports one family — Qwen3 dense decoders
(``/root/reference/src/models/mod.rs:1``). ``get_model`` resolves an HF
``config.json`` ``model_type`` / architecture string to our implementation.
"""

from nano_vllm_candle_tpu.models import qwen3

_REGISTRY = {
    "qwen3": qwen3,
    "Qwen3ForCausalLM": qwen3,
}


def get_model(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; supported: {sorted(_REGISTRY)}"
        ) from None


__all__ = ["qwen3", "get_model"]
