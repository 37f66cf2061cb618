from dsrg_tpu.losses.seed import seed_loss, balanced_seed_loss  # noqa: F401
from dsrg_tpu.losses.constrain import constrain_loss  # noqa: F401
from dsrg_tpu.losses.expand import expand_loss  # noqa: F401
from dsrg_tpu.losses.softmax_ce import softmax_cross_entropy_ignore  # noqa: F401
