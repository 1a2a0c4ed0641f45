"""Host-side data layer: tokenizers, dataset loading, preprocessing,
synthetic data generation (QA-gen, reading comprehension), chunking.

Twin of the reference L1/L3 data components (`/root/reference/dalm/datasets/`,
`dalm/training/utils/*dataloader_utils.py`, `dalm/utils.py`). Everything
here runs on host CPU and feeds static-shape numpy batches to the jitted
device programs.
"""

from dalm_tpu.data.tokenizer import ByteTokenizer, resolve_tokenizer
from dalm_tpu.data.loading import load_dataset
from dalm_tpu.data.preprocess import (
    preprocess_retriever_dataset,
    preprocess_rag_e2e_dataset,
)

__all__ = [
    "ByteTokenizer",
    "resolve_tokenizer",
    "load_dataset",
    "preprocess_retriever_dataset",
    "preprocess_rag_e2e_dataset",
]
