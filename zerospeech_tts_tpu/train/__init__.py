"""L4 — training runtime (ref solver.py, SURVEY.md §2 "Solver / training
runtime"): stage-1 adversarial autoencoder phases and the stage-2
patch-GAN, each phase one donated jitted step function."""

from zerospeech_tts_tpu.train.solver import Solver, TrainState  # noqa: F401
from zerospeech_tts_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from zerospeech_tts_tpu.train.logger import Logger  # noqa: F401
