"""Shared utilities: timing, logging."""
