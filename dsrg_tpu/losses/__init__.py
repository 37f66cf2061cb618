from dsrg_tpu.losses.seed import (  # noqa: F401
    seed_loss,
    balanced_seed_loss,
    balanced_seed_loss_per_sample,
)
from dsrg_tpu.losses.constrain import (  # noqa: F401
    constrain_loss,
    constrain_loss_per_sample,
)
from dsrg_tpu.losses.expand import expand_loss  # noqa: F401
from dsrg_tpu.losses.softmax_ce import (  # noqa: F401
    softmax_cross_entropy_ignore,
    softmax_cross_entropy_ignore_sums,
)
