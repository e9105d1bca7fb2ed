"""Task registry package. Tasks are registered on import."""
