"""Compute ops: math, combiner, tracing, lighting, filters, textures."""
