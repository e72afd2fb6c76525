from multimodal_tpu.eval.topk import top_k_score, topk_metrics
from multimodal_tpu.eval.entropy import average_kth_neighbor_angle, entropy_metric
from multimodal_tpu.eval.separability import linear_separability
from multimodal_tpu.eval.retrieval import get_clip_metrics, recall_at_k
from multimodal_tpu.eval.zero_shot import (
    accuracy_counts,
    build_zero_shot_classifier,
    zero_shot_eval,
)
from multimodal_tpu.eval.linear_probe import linear_probe_metrics, train_linear_probe
from multimodal_tpu.eval.metadata import apply_templates, classnames, templates
from multimodal_tpu.eval.captioning import CaptioningMetric, corpus_bleu, sentence_bleu
