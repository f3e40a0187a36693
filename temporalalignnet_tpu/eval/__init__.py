from temporalalignnet_tpu.eval.metrics import roc_auc_score, retrieval_metrics
from temporalalignnet_tpu.eval.align import AlignmentEvaluator, test_alignment
from temporalalignnet_tpu.eval.retrieval import RetrievalEvaluator, test_retrieval

__all__ = [
    "roc_auc_score",
    "retrieval_metrics",
    "AlignmentEvaluator",
    "test_alignment",
    "RetrievalEvaluator",
    "test_retrieval",
]
