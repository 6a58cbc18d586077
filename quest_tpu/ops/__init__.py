from quest_tpu.ops.rope import apply_rope, compute_rope_params, rope_for
from quest_tpu.ops.rms_norm import rms_norm
from quest_tpu.ops.estimate import (page_scores, page_scores_per_qhead,
                                    page_scores_physical)
from quest_tpu.ops.topk import select_pages

__all__ = [
    "apply_rope", "compute_rope_params", "rope_for", "rms_norm",
    "page_scores", "page_scores_per_qhead", "page_scores_physical",
    "select_pages",
]
