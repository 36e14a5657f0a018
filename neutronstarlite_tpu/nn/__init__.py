"""NN building blocks: parameter init, the NtsAdam optimizer, batchnorm,
dropout — numerics matched to the reference's Parameter / torch modules."""

from neutronstarlite_tpu.nn.param import glorot_uniform, init_linear  # noqa: F401
from neutronstarlite_tpu.nn.optim import nts_adam, NtsAdamState  # noqa: F401
from neutronstarlite_tpu.nn.layers import (  # noqa: F401
    batch_norm_init,
    batch_norm_apply,
    dropout,
    linear,
)
