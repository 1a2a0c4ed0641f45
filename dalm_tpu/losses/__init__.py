"""Loss functions — bit-matched to the reference formulas (SURVEY.md §2.2).

All losses are pure jittable functions over static shapes; the reference's
per-sample Python loop in the marginalized loss
(`/root/reference/dalm/training/utils/train_utils.py:127-132`) is replaced
by a vectorized position mask.
"""

from dalm_tpu.losses.contrastive import (
    cosine_sim_logits,
    nt_xent_loss,
    contrastive_loss,
)
from dalm_tpu.losses.marginalized import (
    marginalized_nll_loss,
    rag_e2e_loss,
)

__all__ = [
    "cosine_sim_logits",
    "nt_xent_loss",
    "contrastive_loss",
    "marginalized_nll_loss",
    "rag_e2e_loss",
]
