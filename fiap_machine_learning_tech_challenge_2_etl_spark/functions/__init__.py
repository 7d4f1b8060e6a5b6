"""Scalar expression helpers (sanitizers, JSON extraction, text statistics)."""
