"""Utility helpers: TLS certificate generation, misc tooling."""
