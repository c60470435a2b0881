from molnextr_tpu.ops.decode_attention import (
    cached_decode_attention,
    cached_decode_attention_layered,
    decode_attention,
    decode_attention_layered,
    decode_attention_reference,
    use_pallas,
)
from molnextr_tpu.ops.folded_attention import (
    cached_folded_attention,
    folded_decode_attention,
    folded_decode_attention_reference,
)

__all__ = [
    "cached_decode_attention",
    "cached_decode_attention_layered",
    "decode_attention",
    "decode_attention_layered",
    "decode_attention_reference",
    "use_pallas",
    "cached_folded_attention",
    "folded_decode_attention",
    "folded_decode_attention_reference",
]
