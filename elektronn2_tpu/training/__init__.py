"""training — the training loop and its support machinery.

Reference: ``elektronn2/training/``.
"""

from elektronn2_tpu.training.trainutils import (
    HistoryTracker, Schedule, pretty_string_time,
)
from elektronn2_tpu.training.parallelisation import BackgroundProc, SharedQ
from elektronn2_tpu.training.trainer import (Trainer, TracingTrainer,
                                             TracingTrainerRNN)

__all__ = ["HistoryTracker", "Schedule", "pretty_string_time",
           "BackgroundProc", "SharedQ", "Trainer", "TracingTrainer",
           "TracingTrainerRNN"]
