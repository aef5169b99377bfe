"""Utilities: config dataclasses, torch checkpoint import, metrics logging."""
