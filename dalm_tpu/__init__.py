"""dalm_tpu — TPU-native domain-adapted language modeling.

A from-scratch JAX/Flax/Pallas/pjit framework with the capabilities of
arcee-ai/DALM (reference: /root/reference): contrastive retriever
fine-tuning, differentiable RAG-end2end joint training, retrieval and
generation evaluation, synthetic data generation, generator-only SFT,
and a CLI — designed TPU-first (SPMD over a device mesh, XLA
collectives, Pallas kernels for the retrieval hot path) rather than
ported from the reference's single-GPU torch code.
"""

import logging

__version__ = "0.1.0"

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S",
    level=logging.INFO,
)
