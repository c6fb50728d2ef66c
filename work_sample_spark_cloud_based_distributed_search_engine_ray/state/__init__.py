"""Checkpoint manifests / lineage for resumable builds."""
