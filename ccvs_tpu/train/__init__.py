"""Training: losses, optimizers, jitted SPMD train steps.

Replaces the reference trainers (`helpers/*_trainer.py`) and the loss methods
of the model wrappers (`models/skip_vid_generator/models/*_model.py`) with
pure loss functions + optax + pjit-sharded step functions.
"""
