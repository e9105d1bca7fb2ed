"""Criterion registry package."""
