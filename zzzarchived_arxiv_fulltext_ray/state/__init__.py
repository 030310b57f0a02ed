"""Checkpoint manifests, lineage and resumable writes."""
