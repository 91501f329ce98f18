"""Training: losses, train states, phase trainers, checkpointing."""
