"""Model zoo: Flax encoder (bge/BERT-class), decoder-only generator
(Llama-class), pooling heads, LoRA parameter transforms, quantization,
and HF-checkpoint interop.

Twin of the reference L2 layer (`/root/reference/dalm/models/`), rebuilt as
pure-functional Flax modules with logical sharding axes so the same code
runs replicated, data-parallel, or tensor-parallel under one mesh.
"""

from dalm_tpu.models.pooling import mean_pool_l2, eos_pool, eos_mask
from dalm_tpu.models.encoder import Encoder, EncoderConfig
from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.models.rag import RagE2EModel, Mode

__all__ = [
    "mean_pool_l2",
    "eos_pool",
    "eos_mask",
    "Encoder",
    "EncoderConfig",
    "Decoder",
    "DecoderConfig",
    "RagE2EModel",
    "Mode",
]
