"""Reference-checkpoint compatibility: torch state_dict -> flax params."""
