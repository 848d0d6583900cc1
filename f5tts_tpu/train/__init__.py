"""Training: flow-matching trainer (pjit DP+TP), EMA, frame-packed batching, checkpoints."""

from f5tts_tpu.train.trainer import TrainConfig, Trainer, make_train_step  # noqa: F401
