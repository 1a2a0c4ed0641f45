"""Retrieval engine: exact sharded dense index living in device HBM.

First-class replacement for the reference's host-side hnswlib eval path
(`/root/reference/dalm/eval/utils.py:18-68`): passage embeddings are a
row-sharded matrix across the whole mesh, search is a fused on-device
dot-product + top-k with shard-local winners merged over ICI. Exact by
construction — recall@k ≥ HNSW's at the same k (SURVEY.md §2.3).
"""

from dalm_tpu.index.dense import ShardedDenseIndex

__all__ = ["ShardedDenseIndex"]
