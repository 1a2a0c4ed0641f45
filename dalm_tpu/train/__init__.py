"""Training loops: retriever-only contrastive, RAG-e2e joint, generator SFT.

Twin of the reference L4 (`/root/reference/dalm/training/`), rebuilt as
jitted pure train steps over a device mesh: optax optimizers, GSPMD
data/tensor parallelism instead of Accelerate/DDP, Orbax checkpoints with
the reference's retriever/generator split and step_k/epoch_e naming.
"""

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from dalm_tpu.train.generator_only import train_generator
    from dalm_tpu.train.rag_e2e import train_e2e
    from dalm_tpu.train.retriever_only import train_retriever

__all__ = ["train_retriever", "train_e2e", "train_generator"]


def __getattr__(name):
    if name == "train_retriever":
        from dalm_tpu.train.retriever_only import train_retriever

        return train_retriever
    if name == "train_e2e":
        from dalm_tpu.train.rag_e2e import train_e2e

        return train_e2e
    if name == "train_generator":
        from dalm_tpu.train.generator_only import train_generator

        return train_generator
    raise AttributeError(name)
