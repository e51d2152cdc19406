"""Reusable column-level helpers (type inference, vector math, text metrics)."""
