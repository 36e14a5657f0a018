from neutronstarlite_tpu.training.trainer import FullGraphTrainer  # noqa: F401
