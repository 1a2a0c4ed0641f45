"""Evaluation harness: retrieval metrics (recall / precision / hit-rate)
and RAG generation exact-match, on top of the exact sharded index.

Twin of the reference L4' (`/root/reference/dalm/eval/`), with hnswlib
replaced by `dalm_tpu.index.ShardedDenseIndex` (exact, on-device) and HF
``generate`` replaced by a jitted KV-cache decode loop.
"""

from dalm_tpu.eval.results import EvalResults

__all__ = ["EvalResults", "evaluate_retriever", "evaluate_rag"]


def __getattr__(name):
    if name == "evaluate_retriever":
        from dalm_tpu.eval.retriever import evaluate_retriever

        return evaluate_retriever
    if name == "evaluate_rag":
        from dalm_tpu.eval.rag import evaluate_rag

        return evaluate_rag
    raise AttributeError(name)
