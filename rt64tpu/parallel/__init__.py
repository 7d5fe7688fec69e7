"""Multi-chip scaling: screen-space row tiling over a device mesh."""
