"""L3 training/eval runtime."""

from spaa_tpu.train.data import load_data, load_setup_info, nayar_separation
from spaa_tpu.train.train import (compute_loss, get_model_train_cfg,
                                  make_compennet_pp_optimizer,
                                  make_evaluator, make_pcnet_optimizer,
                                  sample_batch_indices, train_model_scan)
from spaa_tpu.train.pipeline import (TrainedModel, init_compennet,
                                     train_eval_compennet_pp,
                                     train_eval_pcnet)

__all__ = [
    "load_data", "load_setup_info", "nayar_separation", "compute_loss",
    "get_model_train_cfg", "make_compennet_pp_optimizer", "make_evaluator",
    "make_pcnet_optimizer", "sample_batch_indices", "train_model_scan",
    "TrainedModel", "init_compennet", "train_eval_compennet_pp",
    "train_eval_pcnet",
]
