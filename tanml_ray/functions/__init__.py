"""Scalar/vector helper functions shared by stages (pure, no Ray)."""
