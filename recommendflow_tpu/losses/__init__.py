from recommendflow_tpu.losses import classify, match, regression, weighted
from recommendflow_tpu.losses.match import (
    batch_hard_neg_sample_margin_rank_loss,
    batch_neg_sample_ce_loss,
    batch_neg_sample_margin_rank_loss,
    batch_neg_sample_scaled_multi_class_ce_loss,
    batch_neg_sample_symmetrical_ce_loss,
    batch_neg_sample_symmetrical_scaled_multi_class_ce_loss,
    batch_softmax_probabilistic_combining_soft,
    binary_cross_entropy,
    cosent_loss,
    cosent_loss_v2,
    mean_squared_error,
)
