"""Neural network modules (flax.linen) for the synthesis and action models.

Modules are config-free: constructor arguments carry hyperparameters; the
`config` layer maps YAML scene descriptions onto them. All state that the
reference mutates in place (annealing step, BN running stats, EMA buffers)
is explicit here: steps are passed as arguments, batch stats live in the
`batch_stats` collection, EMA state in the train-state pytree.
"""

from playableenvironments_tpu.models import encoding, layers
