from . import (losses, optim, sequence_loss, train_step, checkpoint,
               trainer, frame_trainer)

__all__ = ["losses", "optim", "sequence_loss", "train_step", "checkpoint",
           "trainer", "frame_trainer"]
