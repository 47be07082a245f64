"""Stateless compute utilities (mirror of reference mia/utils)."""
