"""Utility layer: STL IO, profiling helpers, misc host-side plumbing."""
