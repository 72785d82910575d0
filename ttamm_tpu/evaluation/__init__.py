from .embeddings import (
    analyze_item_neighbors,
    compute_mimic_statistics,
    summarize_embedding_norms,
    summarize_gate_values,
    summarize_user_alignment,
)
from .feature_correlation import compute_feature_correlations
from .metrics import (
    RankingMetrics,
    compute_ranking_metrics,
    metrics_from_hit_matrix,
    per_user_metrics,
)
from .retrieval import (
    EvalPlan,
    build_eval_plan,
    evaluate_retrieval,
    evaluate_retrieval_metrics,
)

__all__ = [
    "EvalPlan",
    "RankingMetrics",
    "build_eval_plan",
    "analyze_item_neighbors",
    "compute_feature_correlations",
    "compute_mimic_statistics",
    "compute_ranking_metrics",
    "evaluate_retrieval",
    "evaluate_retrieval_metrics",
    "metrics_from_hit_matrix",
    "per_user_metrics",
    "summarize_embedding_norms",
    "summarize_gate_values",
    "summarize_user_alignment",
]
