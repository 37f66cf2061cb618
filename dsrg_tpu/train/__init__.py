from dsrg_tpu.train.optimizer import caffe_sgd, lr_step, lr_poly, vgg_param_mults  # noqa: F401
from dsrg_tpu.train.train_state import TrainState  # noqa: F401
