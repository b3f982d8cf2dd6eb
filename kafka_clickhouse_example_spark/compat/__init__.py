"""Environment-compatibility shims (optional dependencies, vendored fallbacks)."""
