"""Durable run state: checkpoint manifests + resume logic."""
