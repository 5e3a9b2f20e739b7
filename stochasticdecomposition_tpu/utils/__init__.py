"""Output writers, metrics, and misc host-side utilities."""
