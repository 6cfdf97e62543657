from .bilstm import (
    BiLSTMConfig,
    init_bilstm_params,
    bilstm_logits,
    bilstm_probs,
    bilstm_predict,
    bilstm_loss,
)
from .cluster_mlp import ClusterMLPConfig, init_cluster_params, cluster_forward
