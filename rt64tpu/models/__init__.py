"""Learned + hand-written upscalers (the DLSS/FSR2/XeSS slot)."""
