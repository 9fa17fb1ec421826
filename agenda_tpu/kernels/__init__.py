from agenda_tpu.kernels.attention import (
    attention,
    attention_reference,
    cross_attention_with_probs,
)

__all__ = ["attention", "attention_reference", "cross_attention_with_probs"]
