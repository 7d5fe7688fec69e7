"""Frame pipeline: scene assembly, view state, and the jitted frame graph."""
