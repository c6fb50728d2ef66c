"""Ray Data stage classes/functions (actor pools + batch transforms)."""
