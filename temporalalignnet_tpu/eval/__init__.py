from temporalalignnet_tpu.eval.align import AlignmentEvaluator, test_alignment
from temporalalignnet_tpu.eval.linear_probe import linear_probe
from temporalalignnet_tpu.eval.metrics import retrieval_metrics, roc_auc_score
from temporalalignnet_tpu.eval.retrieval import (
    RetrievalEvaluator,
    plan_clip_windows,
    sample_clip_windows,
    test_retrieval,
)

__all__ = [
    "roc_auc_score",
    "retrieval_metrics",
    "AlignmentEvaluator",
    "test_alignment",
    "RetrievalEvaluator",
    "test_retrieval",
    "plan_clip_windows",
    "sample_clip_windows",
    "linear_probe",
]
