"""Model registry package. Models/architectures are registered on import."""
