"""Scalar/conditional helper functions (SURVEY.md section 2.8)."""

from .bands import age_group, spend_status, when_bands

__all__ = ["age_group", "spend_status", "when_bands"]
