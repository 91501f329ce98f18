"""Evaluation: metrics, dataset creators, evaluators, and action modifiers."""
