"""Optimizer / LR-scheduler registry package."""
