from neutronstarlite_tpu.sampling.sampler import (  # noqa: F401
    Sampler,
    SampledBlock,
    split_nids_by_mask,
)
