"""Sinks: the reference's one-file-per-record JSON layout (K1/K2) and
friends."""
